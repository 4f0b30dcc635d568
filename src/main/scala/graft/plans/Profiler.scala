package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

/** Data profiler — one-pass per-column statistics
  * (reference: core/src/main/java/org/apache/calcite/profile/Profiler.java,
  * ProfilerImpl.java — column cardinalities, min/max, null counts feeding
  * lattice/materialization suggestions).
  *
  * Spark-first: ONE aggregation job computes every column's stats
  * simultaneously (count/nulls/NDV/min/max per column as parallel
  * aggregate expressions — a single scan however wide the table), then the
  * per-column rows are unpivoted with `stack`. At 100 TB profiling cost is
  * one full scan, the same as the reference's streaming profiler pass.
  * Exact NDV by default (what the oracle can check); HLL approximation is
  * a one-line swap (`approx_count_distinct`) when a 2% error is worth the
  * memory at extreme cardinalities.
  */
object Profiler {

  /** Profile the given columns: (column, n, nulls, ndv, min_s, max_s).
    *
    * Two single-purpose jobs, not one: mixing COUNT(DISTINCT ...) with
    * min/max aggregates makes Catalyst Expand every row once per distinct
    * group (cols+1 copies) AND forces the combined aggregate out of
    * HashAggregate (var-length string min/max buffers) — a sort aggregate
    * over (cols+1)× the input. Two tight codegen'd passes — one plain, one
    * distinct-only — are ~2× faster locally; at cluster scale the second
    * scan rereads only the profiled columns (columnar), trading sequential
    * I/O for not pushing an Expand through the shuffle. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val basicAggs: Seq[Column] = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(v.isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(v).cast("string").as(s"${c}__min"),
        max(v).cast("string").as(s"${c}__max"))
    }
    val ndvAggs: Seq[Column] = cols.map(c => countDistinct(col(c)).as(s"${c}__ndv"))
    // both sides are single rows — the join is a broadcast of one row
    val wide = df.agg(basicAggs.head, basicAggs.tail: _*)
      .crossJoin(df.agg(ndvAggs.head, ndvAggs.tail: _*))
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__ndv`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column, n, nulls, ndv, min_s, max_s)")
  }

  /** Sketch-mode profile (reference: profile/ProfilerImpl.java — the
    * HLL-sketched profiler behind the lattice suggester, vs the exact
    * [[profile]]): NDV via HLL++ (`approx_count_distinct`, default
    * rsd 0.05), nulls/min/max in the SAME aggregate. Because the sketch
    * is a regular (non-distinct) aggregate, the whole profile is ONE
    * codegen'd partial+final HashAggregate pass with no Expand and no
    * sort-aggregate fallback — the exact profiler needs two jobs to avoid
    * that (see [[profile]]'s scaladoc); at 100 TB the sketch mode halves
    * the scans and its state is a fixed few KB per column instead of a
    * distinct hash table. Accuracy contract (the fn_agg_approx pattern):
    * ndv lands within 15% = 3σ of exact at the default rsd; min/max/null
    * counts are exact (they cost nothing extra in the same pass). */
  def profileSketch(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(v.isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        approx_count_distinct(v, rsd).as(s"${c}__ndv"),
        min(v).cast("string").as(s"${c}__min"),
        max(v).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__ndv`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column, n, nulls, ndv, min_s, max_s)")
  }

  /** One measured column combination (reference: profile/Profiler.java
    * Distribution — the combination, its cardinality, and whether the
    * profiler found it worth keeping). */
  final case class ComboStat(cols: Seq[String], expected: Long, actual: Long,
      surprise: Double, retained: Boolean)

  /** Surprise-pruned combination profiling — the reference's
    * ProfilerImpl exploration (profile/ProfilerImpl.java: HLL sketches
    * per space, `surprise()` = |expected−actual| / (expected+actual),
    * a surprise threshold deciding which spaces are retained and
    * expanded). Exact combination profiling is quadratic-to-exponential
    * in the column count; this bounds it three ways, which is what makes
    * wide-table profiling feasible at 100 TB:
    *
    *   1. *Apriori expansion*: a k-combination is a candidate only if
    *      every (k−1)-subset was retained (surprising) — unsurprising
    *      (≈independent) combinations are derivable from their parts, so
    *      their supersets are estimated, never measured;
    *   2. *surprise threshold*: actual ≈ independence-expected means the
    *      combination carries no new information — measured once, then
    *      dropped from the frontier;
    *   3. *per-level budget*: at most `comboBudget` candidates measured
    *      per level (deterministic column order), the SurpriseQueue's
    *      hard bound.
    *
    * Each level's survivors are measured in ONE aggregation pass (all
    * candidates as parallel `approx_count_distinct(struct(...))`
    * aggregates — a single scan per level, ≤ maxDims scans total).
    * Expected cardinality of a candidate is the tightest split bound:
    * min over (k−1)-subsets s of actual(s) · ndv(remaining), capped by
    * the row count. Singletons are always retained (ProfilerImpl seeds
    * the queue with them); their `expected` is the row count. */
  def profileCombos(df: DataFrame, cols: Seq[String], maxDims: Int = 3,
      surpriseThreshold: Double = 0.2, comboBudget: Int = 64,
      rsd: Double = 0.05): Seq[ComboStat] = {
    require(cols.nonEmpty && maxDims >= 1)
    val baseAggs = count(lit(1)).as("__n") +:
      cols.map(c => approx_count_distinct(col(c), rsd).as(c))
    val base = df.agg(baseAggs.head, baseAggs.tail: _*).head()
    val rowCount = base.getLong(0)
    val singleNdv: Map[String, Long] =
      cols.zipWithIndex.map { case (c, i) => c -> base.getLong(i + 1) }.toMap

    val out = scala.collection.mutable.ListBuffer.empty[ComboStat]
    def surprise(e: Long, a: Long): Double =
      if (e + a == 0) 0.0 else math.abs(e.toDouble - a.toDouble) / (e.toDouble + a.toDouble)
    cols.foreach { c =>
      out += ComboStat(Seq(c), rowCount, singleNdv(c),
        surprise(rowCount, singleNdv(c)), retained = true)
    }
    val actualOf = scala.collection.mutable.Map[Seq[String], Long](
      cols.map(c => Seq(c) -> singleNdv(c)): _*)
    var retainedPrev: Set[Seq[String]] = cols.map(Seq(_)).toSet

    for (k <- 2 to maxDims if retainedPrev.nonEmpty) {
      val candidates = cols.combinations(k)
        .filter(c => c.combinations(k - 1).forall(retainedPrev.contains))
        .take(comboBudget).toSeq
      if (candidates.nonEmpty) {
        val aggs = candidates.zipWithIndex.map { case (c, i) =>
          approx_count_distinct(struct(c.map(col): _*), rsd).as(s"c$i")
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val level = candidates.zipWithIndex.map { case (c, i) =>
          val actual = row.getLong(i)
          actualOf(c) = actual
          val expected = c.combinations(k - 1).map { s =>
            val rest = c.diff(s).head
            val sub = actualOf.getOrElse(s, rowCount)
            val prod = sub.toDouble * singleNdv(rest).toDouble
            math.min(rowCount.toDouble, prod).toLong
          }.min
          val sp = surprise(expected, actual)
          ComboStat(c, expected, actual, sp, sp >= surpriseThreshold)
        }
        out ++= level
        retainedPrev = level.filter(_.retained).map(_.cols).toSet
      } else retainedPrev = Set.empty
    }
    out.toList
  }

  /** Lattice-style tile advisor (reference: materialize/Lattice.java +
    * profile/ProfilerImpl — profile-driven aggregate-tile suggestion):
    * measures the TRUE grouped cardinality of every dimension subset up to
    * size `maxDims` in ONE aggregation pass (COUNT(DISTINCT struct) per
    * subset — not the NDV-product estimate, which overshoots under
    * correlation), and returns the subsets whose tile would hold at most
    * `rowBudget` rows — exactly the tiles worth registering with
    * [[MaterializedViews]] for rollup serving. */
  def suggestTiles(df: DataFrame, dims: Seq[String], rowBudget: Long,
      maxDims: Int = 2): Seq[(Seq[String], Long)] = {
    val subsets: Seq[Seq[String]] =
      (1 to maxDims).flatMap(k => dims.combinations(k).toSeq)
    val aggs = subsets.zipWithIndex.map { case (ss, i) =>
      countDistinct(struct(ss.map(col): _*)).as(s"s$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    subsets.zipWithIndex
      .map { case (ss, i) => (ss, row.getLong(i)) }
      .filter(_._2 <= rowBudget)
      .sortBy { case (ss, n) => (-ss.size, n) } // widest affordable first
  }

  /** Sketch variant of [[suggestTiles]] (the ProfilerImpl HLL path the
    * lattice advisor inherits): every subset's grouped cardinality via
    * `approx_count_distinct(struct(...))` — a REGULAR aggregate, so the
    * whole advisory is one codegen'd pass with no Expand and a fixed
    * few-KB sketch per subset, where the exact form Expands every input
    * row once per subset (subsets+1 copies through the shuffle). At
    * 100 TB with tens of dimensions the exact form is infeasible and
    * this is the one that runs. Advisory contract: counts carry the HLL
    * 3σ=15% band, so tiles within that band of `rowBudget` may be
    * admitted/rejected differently than by the exact advisor — fine for
    * an advisor (the tile itself is built exactly either way). */
  def suggestTilesApprox(df: DataFrame, dims: Seq[String], rowBudget: Long,
      maxDims: Int = 2, rsd: Double = 0.05): Seq[(Seq[String], Long)] = {
    val subsets: Seq[Seq[String]] =
      (1 to maxDims).flatMap(k => dims.combinations(k).toSeq)
    val aggs = subsets.zipWithIndex.map { case (ss, i) =>
      approx_count_distinct(struct(ss.map(col): _*), rsd).as(s"s$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    subsets.zipWithIndex
      .map { case (ss, i) => (ss, row.getLong(i)) }
      .filter(_._2 <= rowBudget)
      .sortBy { case (ss, n) => (-ss.size, n) }
  }

  /** Sketch-screened functional-dependency discovery over ALL ordered
    * column pairs (reference: ProfilerImpl emits FunctionalDependency and
    * Unique from its sketched distributions — ndv(a,b) = ndv(a) means
    * a determines b, ndv(a) = rowCount means a is a key). Exact
    * discovery over p columns needs p·(p−1) grouped passes; this runs
    * ONE sketch pass (singles + pairs, no Expand), screens candidate
    * FDs inside a generous HLL band, and exact-confirms only the
    * survivors with [[functionalDeps]] — at 100 TB the screen is the
    * difference between p² fact scans and one.
    *
    * Probabilistic contract (r9 ADVICE): the screen can produce FALSE
    * NEGATIVES. A sketch refutation means the two estimates deviate
    * beyond a 3·(3·rsd) band — overwhelmingly a real violation, but
    * with p² pairs tested an occasional true FD lands in the band's
    * tail and is reported as not holding WITHOUT exact confirmation
    * (at rsd=0.05 the band is ±45% relative, so the per-pair miss
    * probability is ≪1e-6; it is never zero). False POSITIVES cannot
    * happen: every screened-in candidate is exact-confirmed. Callers
    * needing a guaranteed verdict for a specific pair should call
    * [[functionalDeps]] on it directly. Returns (fd, holds) for every
    * ordered pair, plus (unique:c, holds) per column. */
  def discoverFds(df: DataFrame, cols: Seq[String], rsd: Double = 0.05)
      : Seq[(String, Boolean)] = {
    val baseAggs = count(lit(1)).as("__n") +:
      (cols.map(c => approx_count_distinct(col(c), rsd).as(s"s_$c")) ++
        cols.combinations(2).toSeq.flatMap { pair =>
          Seq(approx_count_distinct(struct(pair.map(col): _*), rsd)
            .as(s"p_${pair.head}__${pair(1)}"))
        })
    val row = df.agg(baseAggs.head, baseAggs.tail: _*).head()
    def get(name: String): Long = row.getLong(row.fieldIndex(name))
    val n = get("__n")
    // each estimate carries ~3σ = 3·rsd; two independent estimates
    // compound, and screening IN an extra candidate costs only one cheap
    // exact confirmation, so the band is widened to 3× (not 2×) to push
    // the false-negative tail down (see the contract in the doc above)
    val band = 3 * rsd
    def close(a: Long, b: Long): Boolean =
      math.abs(a.toDouble - b) <= 3 * band * math.max(a.toDouble, b)
    val pairs = for {
      a <- cols; b <- cols if a != b
    } yield {
      val pairNdv = get(if (cols.indexOf(a) < cols.indexOf(b)) s"p_${a}__$b" else s"p_${b}__$a")
      (a, b, close(pairNdv, get(s"s_$a")))
    }
    val candidates = pairs.collect { case (a, b, true) => (a, b) }
    val confirmed: Map[(String, String), Boolean] =
      if (candidates.isEmpty) Map.empty
      else functionalDeps(df, candidates).collect()
        .map(r => {
          val Array(a, b) = r.getString(0).split("->")
          (a, b) -> r.getBoolean(1)
        }).toMap
    val fds = pairs.map { case (a, b, cand) =>
      s"$a->$b" -> (cand && confirmed.getOrElse((a, b), false))
    }
    // unique keys: sketch-screen against the row count, exact-confirm
    // survivors (the band is far too generous to DECLARE uniqueness —
    // a 90%-distinct column sits inside it — but tight enough that a
    // true key always screens in)
    val uniqueCands = cols.filter(c => close(get(s"s_$c"), n))
    val uniqueConfirmed: Map[String, Boolean] =
      if (uniqueCands.isEmpty) Map.empty
      else uniqueKeys(df, uniqueCands).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val uniques = cols.map(c =>
      s"unique:$c" -> uniqueConfirmed.getOrElse(s"unique:$c", false))
    fds ++ uniques
  }

  /** Functional-dependency check a → b: does every value of `a` map to at
    * most one value of `b`? (reference: profile/Profiler.java
    * FunctionalDependency; RelMdColumnUniqueness uses the same facts.)
    * One grouped pass per pair — at extreme scale, run over a sample or
    * swap in approx_count_distinct; the decision is the same either way
    * unless the violation rate is vanishing. */
  def functionalDeps(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    pairs.map { case (a, b) =>
      df.groupBy(col(a)).agg(countDistinct(col(b)).as("nb"))
        .agg(max(col("nb")).as("maxnb"))
        .select(lit(s"$a->$b").as("fd"), (col("maxnb") <= 1).as("holds"))
    }.reduce(_ unionAll _)

  /** Unique-key check: no nulls and NDV == row count (reference:
    * Profiler.Unique / RelMdColumnUniqueness). */
  def uniqueKeys(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(count(lit(1)).as("n"), count(col(c)).as("nn"),
          countDistinct(col(c)).as("ndv"))
        .select(lit(s"unique:$c").as("fd"),
          (col("n") === col("nn") && col("n") === col("ndv")).as("holds"))
    }.reduce(_ unionAll _)

  val defs: Seq[graft.QDef] = Seq(
    graft.QDef.sql("profile_fds",
      """SELECT 'o_orderkey->o_custkey' AS fd, max(nb) <= 1 AS holds FROM (
        |  SELECT count(DISTINCT o_custkey) AS nb FROM orders GROUP BY o_orderkey)
        |UNION ALL
        |SELECT 'o_custkey->o_orderstatus', max(nb) <= 1 FROM (
        |  SELECT count(DISTINCT o_orderstatus) AS nb FROM orders GROUP BY o_custkey)
        |UNION ALL
        |SELECT 'l_orderkey->l_partkey', max(nb) <= 1 FROM (
        |  SELECT count(DISTINCT l_partkey) AS nb FROM lineitem GROUP BY l_orderkey)
        |UNION ALL
        |SELECT 'unique:o_orderkey',
        |  count(*) = count(o_orderkey) AND count(*) = count(DISTINCT o_orderkey)
        |FROM orders
        |UNION ALL
        |SELECT 'unique:o_custkey',
        |  count(*) = count(o_custkey) AND count(*) = count(DISTINCT o_custkey)
        |FROM orders""") { (s, dir) =>
      val orders = graft.Tables.t(s, dir, "orders")
      val lineitem = graft.Tables.t(s, dir, "lineitem")
      functionalDeps(orders, Seq(("o_orderkey", "o_custkey"),
          ("o_custkey", "o_orderstatus")))
        .unionAll(functionalDeps(lineitem, Seq(("l_orderkey", "l_partkey"))))
        .unionAll(uniqueKeys(orders, Seq("o_orderkey", "o_custkey")))
    },

    // Lattice growth from an observed workload (reference:
    // materialize/LatticeSuggester.java): three star queries over the
    // lineitem fact merge into ONE lattice (evolve), whose structure and
    // measured tile cardinalities are the output. The oracle replays the
    // expected structure verbatim and recomputes every tile count over
    // the same snowflake join — a drifted suggester (wrong arm, wrong
    // dim, wrong orientation) hash-mismatches.
    graft.QDef.sql("profile_lattice",
      """WITH j AS (
        |  SELECT c_mktsegment, o_orderpriority, p_brand
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN customer ON o_custkey = c_custkey)
        |SELECT 'root' AS item, 'lineitem' AS detail, CAST(NULL AS BIGINT) AS nrows
        |UNION ALL SELECT 'step', 'lineitem->orders [l_orderkey=o_orderkey]', NULL
        |UNION ALL SELECT 'step', 'lineitem->part [l_partkey=p_partkey]', NULL
        |UNION ALL SELECT 'step', 'orders->customer [o_custkey=c_custkey]', NULL
        |UNION ALL SELECT 'dim', 'customer.c_mktsegment', NULL
        |UNION ALL SELECT 'dim', 'orders.o_orderpriority', NULL
        |UNION ALL SELECT 'dim', 'part.p_brand', NULL
        |UNION ALL SELECT 'measure', 'COUNT(*)', NULL
        |UNION ALL SELECT 'measure', 'SUM(lineitem.l_extendedprice)', NULL
        |UNION ALL SELECT 'measure', 'SUM(lineitem.l_quantity)', NULL
        |UNION ALL SELECT 'tile', 'c_mktsegment',
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT c_mktsegment FROM j) x)
        |UNION ALL SELECT 'tile', 'o_orderpriority',
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderpriority FROM j) x)
        |UNION ALL SELECT 'tile', 'p_brand',
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT p_brand FROM j) x)
        |UNION ALL SELECT 'tile', 'c_mktsegment,o_orderpriority',
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT c_mktsegment, o_orderpriority FROM j) x)
        |UNION ALL SELECT 'tile', 'c_mktsegment,p_brand',
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT c_mktsegment, p_brand FROM j) x)
        |UNION ALL SELECT 'tile', 'o_orderpriority,p_brand',
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderpriority, p_brand FROM j) x)""") { (s, dir) =>
      import org.apache.spark.sql.functions.{count => fcount, lit => flit, sum => fsum}
      val li = graft.Tables.t(s, dir, "lineitem")
      val ord = graft.Tables.t(s, dir, "orders")
      val prt = graft.Tables.t(s, dir, "part")
      val cst = graft.Tables.t(s, dir, "customer")
      // the observed workload: three star queries rooted at lineitem
      val q1 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(fsum(col("l_quantity")).as("m"))
      val q2 = li.join(prt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(fcount(flit(1)).as("m"))
      val q3 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cst, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"), col("c_mktsegment"))
        .agg(fsum(col("l_extendedprice")).as("m"))
      val sg = new LatticeSuggester.Suggester()
      Seq(q1, q2, q3).foreach(sg.addQuery)
      val lat = sg.latticeSet.head
      val structure: Seq[(String, String, Option[Long])] =
        Seq(("root", lat.root, None)) ++
          lat.steps.map(st => ("step", st.toString, None)) ++
          lat.dims.toSeq.sorted.map(d => ("dim", d, None)) ++
          lat.measures.toSeq.map(_.toString).sorted.map(m => ("measure", m, None))
      val tiles = LatticeSuggester
        .suggestTiles(s, dir, lat, rowBudget = 100000L, maxDims = 2)
        .map { case (ss, n) => ("tile", ss.mkString(","), Some(n)) }
      import s.implicits._
      (structure ++ tiles).toDF("item", "detail", "nrows")
    },

    graft.QDef.sql("profile_columns",
      """SELECT 'l_returnflag' AS column, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
        |  COUNT(DISTINCT l_returnflag) AS ndv,
        |  CAST(MIN(l_returnflag) AS VARCHAR) AS min_s, CAST(MAX(l_returnflag) AS VARCHAR) AS max_s
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', COUNT(*),
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT l_quantity),
        |  CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_orderkey', COUNT(*),
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT l_orderkey),
        |  CAST(MIN(l_orderkey) AS VARCHAR), CAST(MAX(l_orderkey) AS VARCHAR)
        |FROM lineitem""") { (s, dir) =>
      profile(graft.Tables.t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_quantity", "l_orderkey"))
    },

    // Sketch-mode profile vs its exact twin (the fn_agg_approx oracle
    // pattern): both engines run their own HLL sketch and the compared
    // output carries the EXACT stats plus a within-3σ flag, hash-exact
    // while still executing the sketch path on both sides. Spark's
    // sketch profile is the one-pass/no-Expand plan ProfilerSpec pins.
    graft.QDef.sql("profile_columns_sketch",
      """SELECT 'l_returnflag' AS column, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
        |  COUNT(DISTINCT l_returnflag) AS ndv_exact,
        |  abs(CAST(approx_count_distinct(l_returnflag) AS DOUBLE)
        |      - COUNT(DISTINCT l_returnflag)) <= 0.15 * COUNT(DISTINCT l_returnflag)
        |    AS ndv_within_tol,
        |  CAST(MIN(l_returnflag) AS VARCHAR) AS min_s, CAST(MAX(l_returnflag) AS VARCHAR) AS max_s
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', COUNT(*),
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT l_quantity),
        |  abs(CAST(approx_count_distinct(l_quantity) AS DOUBLE)
        |      - COUNT(DISTINCT l_quantity)) <= 0.15 * COUNT(DISTINCT l_quantity),
        |  CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_orderkey', COUNT(*),
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT l_orderkey),
        |  abs(CAST(approx_count_distinct(l_orderkey) AS DOUBLE)
        |      - COUNT(DISTINCT l_orderkey)) <= 0.15 * COUNT(DISTINCT l_orderkey),
        |  CAST(MIN(l_orderkey) AS VARCHAR), CAST(MAX(l_orderkey) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_partkey', COUNT(*),
        |  CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT l_partkey),
        |  abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
        |      - COUNT(DISTINCT l_partkey)) <= 0.15 * COUNT(DISTINCT l_partkey),
        |  CAST(MIN(l_partkey) AS VARCHAR), CAST(MAX(l_partkey) AS VARCHAR)
        |FROM lineitem""") { (s, dir) =>
      val cs = Seq("l_returnflag", "l_quantity", "l_orderkey", "l_partkey")
      val li = graft.Tables.t(s, dir, "lineitem")
      val sketch = profileSketch(li, cs)
        .select(col("column"), col("ndv").as("ndv_sketch"))
      profile(li, cs).join(sketch, "column")
        .select(col("column"), col("n"), col("nulls"),
          col("ndv").as("ndv_exact"),
          (abs(col("ndv_sketch").cast(DoubleType) - col("ndv"))
            <= lit(0.15) * col("ndv")).as("ndv_within_tol"),
          col("min_s"), col("max_s"))
    }
  )
}
