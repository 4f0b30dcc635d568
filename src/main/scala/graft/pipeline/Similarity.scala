package graft.pipeline

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline; the
  * random-hyperplane LSH bucketing is the 100 TB scale path (candidates
  * restricted to matching buckets before exact re-ranking).
  *
  * Scale design: the query set is broadcast (small side), the corpus is
  * scanned once — no corpus self-shuffle. Dot products fold through
  * DECIMAL accumulators (exact, order-independent) and only become doubles
  * at the final division, so results are bit-stable under any parallelism
  * and reproducible against the DuckDB oracle.
  */
object Similarity {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  /** Exact order-independent sum of a double array: decimal-accumulated.
    * The per-step cast back to the accumulator type keeps the fold lambda's
    * return type identical to the zero value (Spark widens decimal '+'). */
  def decSum(arr: Column): Column =
    aggregate(arr,
      lit(BigDecimal(0)).cast(DecimalType(38, 12)),
      (acc, x) => (acc + x.cast(DecimalType(28, 12))).cast(DecimalType(38, 12)))

  /** Sequential left-fold double sum — IEEE-identical to DuckDB's
    * `list_reduce(l, (x,y) -> x+y)` (0.0 + first element == first element,
    * so fold-from-zero and fold-from-head coincide exactly). Use for
    * within-row vector math; NOT order-stable across a shuffle (use decSum
    * for aggregations over rows). */
  def dSum(arr: Column): Column = aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two double vectors. Uses the codegen'd
    * DotProduct expression — same left-to-right accumulation as the
    * interpreted fold and DuckDB's list_reduce, so results are bit-equal;
    * only the execution path changes (WholeStageCodegen loop vs
    * CodegenFallback lambda dispatch). */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.DotProduct.dot_product
    dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)))
  }

  /** 8-bit random-hyperplane LSH bucket. Hyperplane weights are integer
    * pseudo-noise ((i*31 + b*17) % 7 - 3, 1-based dim index) so the bucket
    * is computable exactly in any engine — sign of the left-to-right IEEE
    * fold of v[i]*w(b,i), which DuckDB's list_reduce reproduces bit for
    * bit. Evaluated by the codegen'd [[graft.functions.HyperplaneBits]]
    * kernel (one pass over the vector for all bits); the interpreted
    * equivalent is `sign(dSum(zip_with(v, seq, x*w)))` per bit —
    * ExpressionSpec asserts their equality. */
  def hyperplaneBucket(v: Column, bits: Int = 8): Column =
    graft.functions.HyperplaneBits.hyperplane_bits(v, bits)

  /** The interpreted construction hyperplaneBucket compiles: one
    * higher-order fold per bit. Kept as the spec reference. */
  def hyperplaneBucketInterpreted(v: Column, bits: Int = 8): Column =
    (0 until bits).map { b =>
      val dot = dSum(
        zip_with(v, sequence(lit(1), size(v)),
          (x, i) => x * ((i * 31 + b * 17) % 7 - 3).cast("double")))
      when(dot >= 0.0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Lloyd/k-means training for IVF centroids. Seeded with the first k
    * corpus vectors; each iteration assigns every vector to its nearest
    * centroid by cosine (one broadcast join over a single corpus scan) and
    * recomputes centroids as per-cell per-dimension means. The means go
    * through DECIMAL sums, so training is deterministic under any
    * partitioning — two runs give byte-identical centroids.
    *
    * Scale: per iteration, one corpus scan + one shuffle of (cell, dim,
    * value) triples for the mean — no corpus self-join at any point.
    */
  def ivfTrain(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    import graft.functions.DotProduct.dot_product
    val e = corpus.select(col("vec_id"), col("v"))
      .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))
    var cents = e.where(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      .localCheckpoint(eager = true)
    for (_ <- 0 until iters) {
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy((dot_product(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).desc,
          col("cid"))
      val assigned = e.join(broadcast(cents))
        .withColumn("rk", row_number().over(wAssign)).where(col("rk") === 1)
        .select(col("cid"), col("v"))
      val means = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double")
          / count(lit(1))).as("mx"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mx")))),
          s => s.getField("mx")).as("new_cv"))
      // a cell that attracted no vectors this round KEEPS its previous
      // centroid (standard Lloyd empty-cell handling) — otherwise k would
      // silently shrink and probe recall degrade
      val next = cents.select(col("cid"), col("cv").as("prev_cv"))
        .join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("new_cv"), col("prev_cv")).as("cv"))
        .withColumn("cnrm", sqrt(graft.functions.DotProduct.dot_product(col("cv"), col("cv"))))
        .localCheckpoint(eager = true)
      // next is materialized — the previous round's pinned centroid
      // blocks are dead; release them instead of stacking one per round
      graft.Checkpoints.release(cents)
      cents = next
    }
    // the final centroid frame backs the caller's plan; the next training
    // run for the same session supersedes (and frees) it
    graft.Checkpoints.superseding("ivf_centroids", cents)
  }

  val defs: Seq[QDef] = Seq(

    // ---- Brute-force cosine top-k -----------------------------------------
    // Queries (vec_id < 10) broadcast against the full corpus; top-10 by
    // (cosine desc, vec_id) per query via window rank.
    QDef.sql("sim_topk_bruteforce",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS vid,
        |    list_reduce(list_transform(list_zip(q.v, c.v), p -> p[1]*p[2]), (x, y) -> x + y)
        |      / (sqrt(list_reduce(list_transform(q.v, x -> x*x), (x, y) -> x + y))
        |         * sqrt(list_reduce(list_transform(c.v, x -> x*x), (x, y) -> x + y))) AS cosim
        |  FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |)
        |SELECT qid, vid, cosim, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vid) AS rk
        |  FROM scored
        |) WHERE rk <= 10""") { (s, dir) =>
      val cpus = s.sparkContext.defaultParallelism
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("nrm", sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))))
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("vq"), col("nrm").as("nq"))
      // corpus side repartitioned: the fixture parquet is one split, and a
      // broadcast-NL join over one partition would run single-threaded
      val corpus = e.repartition(cpus)
        .select(col("vec_id").as("vid"), col("v").as("vc"), col("nrm").as("nv"))
      val dot = graft.functions.DotProduct.dot_product(col("vq"), col("vc"))
      val scored = broadcast(q).join(corpus, col("vid") =!= col("qid"))
        .select(col("qid"), col("vid"), (dot / (col("nq") * col("nv"))).as("cosim"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vid"))
      scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 10)
    },

    // ---- Range (radius) search: everything within cosine >= τ -------------
    // The top-k complement: retrieval by SIMILARITY FLOOR instead of
    // count — RAG context harvesting ("all chunks at least this related")
    // and duplicate sweeps use exactly this shape. Result size varies per
    // query, so no window/rank at all: one broadcast of the queries, one
    // corpus scan, a codegen'd dot + threshold filter — strictly cheaper
    // than top-k (no per-query ordering state).
    QDef.sql("sim_range_search",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |)
        |SELECT qid, vid, cosim FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS vid,
        |    list_reduce(list_transform(list_zip(q.v, c.v), p -> p[1]*p[2]), (x, y) -> x + y)
        |      / (q.nrm * c.nrm) AS cosim
        |  FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |) WHERE cosim >= 0.25""") { (s, dir) =>
      val cpus = s.sparkContext.defaultParallelism
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("nrm", sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))))
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("vq"), col("nrm").as("nq"))
      val corpus = e.repartition(cpus)
        .select(col("vec_id").as("vid"), col("v").as("vc"), col("nrm").as("nv"))
      val dot = graft.functions.DotProduct.dot_product(col("vq"), col("vc"))
      broadcast(q).join(corpus, col("vid") =!= col("qid"))
        .select(col("qid"), col("vid"), (dot / (col("nq") * col("nv"))).as("cosim"))
        .where(col("cosim") >= 0.25)
    },

    // ---- Hyperplane-LSH bucketing (exact, engine-independent) -------------
    QDef.sql("sim_lsh_buckets",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), bits AS (
        |  SELECT vec_id, b,
        |    CASE WHEN list_reduce(list_transform(generate_series(1, len(v)),
        |        i -> v[i] * ((i*31 + b*17) % 7 - 3)), (x, y) -> x + y) >= 0
        |         THEN CAST(1 AS BIGINT) << b ELSE 0 END AS bitv
        |  FROM v, LATERAL (SELECT unnest(generate_series(0, 7)) AS b) h
        |)
        |SELECT vec_id, CAST(SUM(bitv) AS BIGINT) AS bucket
        |FROM bits GROUP BY vec_id""") { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .select(col("vec_id"), hyperplaneBucket(col("v")).as("bucket"))
    },

    // ---- LSH-restricted ANN top-k (scale path) ----------------------------
    // Same scoring as brute force but candidates limited to the query's
    // bucket — the shape that survives a 100 TB corpus. Recall < 1 vs the
    // full ranking by design, but the bucket-restricted result itself is
    // exact arithmetic end-to-end (engine-independent integer hyperplanes +
    // IEEE-stable fold), so the oracle recomputes the identical pipeline.
    QDef.sql("sim_ann_lsh_topk",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), bits AS (
        |  SELECT vec_id, b,
        |    CASE WHEN list_reduce(list_transform(generate_series(1, len(v)),
        |        i -> v[i] * ((i*31 + b*17) % 7 - 3)), (x, y) -> x + y) >= 0
        |         THEN CAST(1 AS BIGINT) << b ELSE 0 END AS bitv
        |  FROM v, LATERAL (SELECT unnest(generate_series(0, 7)) AS b) h
        |), buckets AS (
        |  SELECT vec_id, CAST(SUM(bitv) AS BIGINT) AS bucket FROM bits GROUP BY vec_id
        |), scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS vid,
        |    list_reduce(list_transform(list_zip(q.v, c.v), p -> p[1]*p[2]), (x, y) -> x + y)
        |      / (sqrt(list_reduce(list_transform(q.v, x -> x*x), (x, y) -> x + y))
        |         * sqrt(list_reduce(list_transform(c.v, x -> x*x), (x, y) -> x + y))) AS cosim
        |  FROM v q
        |  JOIN buckets qb ON qb.vec_id = q.vec_id
        |  JOIN buckets cb ON cb.bucket = qb.bucket
        |  JOIN v c ON c.vec_id = cb.vec_id AND c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10
        |)
        |SELECT qid, vid, cosim, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vid) AS rk
        |  FROM scored
        |) WHERE rk <= 10""") { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("nrm", sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))))
        .withColumn("bucket", hyperplaneBucket(col("v")))
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("vq"),
          col("nrm").as("nq"), col("bucket").as("qb"))
      val corpus = e.repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id").as("vid"), col("v").as("vc"),
          col("nrm").as("nv"), col("bucket").as("cb"))
      val dot = graft.functions.DotProduct.dot_product(col("vq"), col("vc"))
      val scored = broadcast(q)
        .join(corpus, col("qb") === col("cb") && col("vid") =!= col("qid"))
        .select(col("qid"), col("vid"), (dot / (col("nq") * col("nv"))).as("cosim"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vid"))
      scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 10)
    },

    // ---- IVF-style ANN: coarse quantizer + probe-limited search -----------
    // The inverted-file scale path: every corpus vector is assigned to its
    // nearest of K centroid cells (one broadcast join — the corpus is
    // scanned once, never self-joined); a query probes only its nprobe
    // nearest cells. Centroids here are K fixed corpus vectors, so the
    // whole pipeline is exact arithmetic and fully oracle-verifiable — a
    // production IVF would train them with Lloyd iterations (repeated
    // groupBy-average over the same assignment join, identical plan shape).
    QDef.sql("sim_ann_ivf_topk",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |), cents AS (
        |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM v WHERE vec_id < 16
        |), assigned AS (
        |  SELECT vid, cid, v, nrm FROM (
        |    SELECT c.vec_id AS vid, ce.cid, c.v, c.nrm,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        list_reduce(list_transform(list_zip(c.v, ce.cv), p -> p[1]*p[2]), (x, y) -> x + y)
        |          / (c.nrm * ce.cnrm) DESC, ce.cid) AS rk
        |    FROM v c, cents ce
        |  ) WHERE rk = 1
        |), probes AS (
        |  SELECT qid, cid, qv, qnrm FROM (
        |    SELECT q.vec_id AS qid, ce.cid, q.v AS qv, q.nrm AS qnrm,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(list_zip(q.v, ce.cv), p -> p[1]*p[2]), (x, y) -> x + y)
        |          / (q.nrm * ce.cnrm) DESC, ce.cid) AS rk
        |    FROM v q, cents ce WHERE q.vec_id >= 16 AND q.vec_id < 26
        |  ) WHERE rk <= 2
        |), scored AS (
        |  SELECT p.qid, a.vid,
        |    list_reduce(list_transform(list_zip(p.qv, a.v), p2 -> p2[1]*p2[2]), (x, y) -> x + y)
        |      / (p.qnrm * a.nrm) AS cosim
        |  FROM probes p JOIN assigned a ON a.cid = p.cid
        |  WHERE a.vid <> p.qid
        |)
        |SELECT qid, vid, cosim, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosim DESC, vid) AS rk
        |  FROM scored
        |) WHERE rk <= 10""") { (s, dir) =>
      import graft.functions.DotProduct.dot_product
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))
      val cents = e.where(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      val corpus = e.repartition(s.sparkContext.defaultParallelism)
      // cell assignment: one broadcast join corpus × centroids, keep rk=1
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy((dot_product(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).desc,
          col("cid"))
      val assigned = corpus.join(broadcast(cents))
        .withColumn("rk", row_number().over(wAssign))
        .where(col("rk") === 1)
        .select(col("vec_id").as("vid"), col("cid"), col("v"), col("nrm"))
      // query probes: nprobe=2 nearest cells per query
      val q = e.where(col("vec_id") >= 16 && col("vec_id") < 26)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
      val wProbe = Window.partitionBy(col("qid"))
        .orderBy((dot_product(col("qv"), col("cv")) / (col("qnrm") * col("cnrm"))).desc,
          col("cid"))
      val probes = q.join(broadcast(cents))
        .withColumn("rk", row_number().over(wProbe))
        .where(col("rk") <= 2)
        .select(col("qid"), col("cid"), col("qv"), col("qnrm"))
      // probe-limited search + final exact re-rank
      val scored = broadcast(probes)
        .join(assigned, Seq("cid"))
        .where(col("vid") =!= col("qid"))
        .select(col("qid"), col("vid"),
          (dot_product(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosim"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vid"))
      scored.withColumn("rk", row_number().over(wTop)).where(col("rk") <= 10)
    },

    // ---- INT8-quantized cosine top-k (the 100 TB memory path) -------------
    // Symmetric int8 quantization (per-vector scale = max|x|/127, code =
    // floor(x/s + 0.5)) shrinks the resident corpus 4× and turns the dot
    // product into exact BIGINT arithmetic; the per-vector scales CANCEL
    // in the cosine, so the approximate score is pure-integer dot over
    // quantized norms — bit-portable with no rounding tricks (floor and
    // IEEE division/sqrt are exact-identical on both engines, unlike
    // round()'s half-even/half-up skew). Queries broadcast; the corpus is
    // scanned once and never self-joined.
    QDef.sql("sim_quantized_cosine",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |sc AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
        |  FROM v),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(v, x -> CAST(floor(x / s + 0.5) AS BIGINT)) AS qv
        |  FROM sc WHERE s > 0),
        |n AS (
        |  SELECT vec_id, qv,
        |    sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS qn
        |  FROM q),
        |scored AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS vid,
        |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS DOUBLE)
        |      / (a.qn * b.qn) AS qcos
        |  FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id <> a.vec_id)
        |SELECT qid, vid, qcos, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, vid) AS rk
        |  FROM scored) WHERE rk <= 10""") { (s, dir) =>
      import graft.functions.LongDotProduct.long_dot
      val cpus = s.sparkContext.defaultParallelism
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val withS = e
        .select(col("vec_id"), col("v"),
          (array_max(transform(col("v"), x => abs(x))) / 127.0).as("s"))
        .where(col("s") > 0)
      val q = withS.select(col("vec_id"),
        transform(col("v"), x => floor(x / col("s") + 0.5).cast("long")).as("qv"))
      // integer self-dot is exact and order-free — long_dot ≡ the
      // interpreted aggregate(transform(qv, x*x)) fold, but codegen'd
      val withN = q.select(col("vec_id"), col("qv"),
        sqrt(long_dot(col("qv"), col("qv")).cast("double")).as("qn"))
      val qs = withN.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("qv").as("qa"), col("qn").as("na"))
      // corpus side repartitioned: the fixture parquet is one split, and a
      // broadcast-NL join over one partition would run single-threaded
      // (the sim_topk_bruteforce trap — r14 VERDICT fault #1)
      val cs = withN.repartition(cpus)
        .select(col("vec_id").as("vid"), col("qv").as("qb"), col("qn").as("nb"))
      val scored = broadcast(qs).join(cs, col("vid") =!= col("qid"))
        .select(col("qid"), col("vid"),
          (long_dot(col("qa"), col("qb"))
            .cast("double") / (col("na") * col("nb"))).as("qcos"))
      val wQ = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("vid"))
      scored.withColumn("rk", row_number().over(wQ)).where(col("rk") <= 10)
    },

    // ---- PRODUCT QUANTIZATION + ADC top-k (the deep-compression path) -----
    // PQ(m=8, 16 codewords): each vector's 8 subvectors encode as the
    // nearest codeword (codebook = the first 16 corpus vectors'
    // subvectors — deterministic, exactly like sim_ann_ivf's fixed
    // centroids; production trains them with k-means, the plan shape is
    // identical). A query never touches the corpus floats: its 8×16
    // distance LUT (tiny — broadcast) joins the corpus CODES (1 byte per
    // subspace at scale, a 32× memory cut) and ADC distance is the
    // LUT-sum. Determinism: subspace L2² folds are sequential (identical
    // IEEE streams both engines); LUT entries round to 9 decimals then
    // decimal-sum, so the 8-way ADC sum is order-independent.
    QDef.sql("sim_pq_adc_topk",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |sub AS (
        |  SELECT vec_id, j, v[(j*8+1):(j*8+8)] AS sv
        |  FROM v, LATERAL (SELECT unnest(range(0, 8)) AS j) g),
        |cb AS (SELECT j, vec_id AS k, sv AS cv FROM sub WHERE vec_id < 16),
        |cand AS (
        |  SELECT s.vec_id, s.j, c.k,
        |    list_reduce(list_transform(list_zip(s.sv, c.cv),
        |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS d2
        |  FROM sub s JOIN cb c ON s.j = c.j),
        |codes AS (
        |  SELECT vec_id, j, k AS code FROM (
        |    SELECT vec_id, j, k,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, k) AS rn
        |    FROM cand) WHERE rn = 1),
        |lut AS (
        |  SELECT s.vec_id AS qid, s.j AS lj, c.k AS lk,
        |    CAST(round(list_reduce(list_transform(list_zip(s.sv, c.cv),
        |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y), 9)
        |      AS DECIMAL(28,12)) AS qd
        |  FROM sub s JOIN cb c ON s.j = c.j
        |  WHERE s.vec_id BETWEEN 16 AND 25),
        |adc AS (
        |  SELECT qid, vec_id AS vid, CAST(SUM(qd) AS DOUBLE) AS adc_d2
        |  FROM codes JOIN lut ON lj = j AND lk = code
        |  WHERE vec_id <> qid
        |  GROUP BY qid, vec_id)
        |SELECT qid, vid, adc_d2, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc_d2, vid) AS rk
        |  FROM adc) WHERE rk <= 10""") { (s, dir) =>
      import graft.functions.SquaredL2.squared_l2
      val cpus = s.sparkContext.defaultParallelism
      val v = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val sub = v
        .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("j"), col("v"))
        .select(col("vec_id"), col("j"), expr("slice(v, j*8+1, 8)").as("sv"))
      val cb = sub.where(col("vec_id") < 16)
        .select(col("j").as("cj"), col("vec_id").as("k"), col("sv").as("cv"))
      // squared_l2 is the codegen'd left-to-right (x-y)² fold — bit-equal
      // to both the interpreted aggregate(zip_with) lambda and DuckDB's
      // list_reduce, but WholeStageCodegen-resident
      def l2(a: Column, b: Column): Column = squared_l2(a, b)
      // the sub×codebook distance stage is the heavy fold (corpus ×16);
      // repartition so it doesn't run on the fixture's single split
      // (r14 VERDICT fault #1 — one core did all scoring under load)
      val cand = sub.repartition(cpus).join(broadcast(cb), col("j") === col("cj"))
        .withColumn("d2", l2(col("sv"), col("cv")))
      val wCode = Window.partitionBy(col("vec_id"), col("j"))
        .orderBy(col("d2"), col("k"))
      val codes = cand.withColumn("rn", row_number().over(wCode))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("j"), col("k").as("code"))
      val lut = sub.where(col("vec_id").between(16, 25))
        .join(broadcast(cb), col("j") === col("cj"))
        .select(col("vec_id").as("qid"), col("j").as("lj"), col("k").as("lk"),
          round(l2(col("sv"), col("cv")), 9)
            .cast(org.apache.spark.sql.types.DecimalType(28, 12)).as("qd"))
      val adc = codes
        .join(broadcast(lut), col("lj") === col("j") && col("lk") === col("code"))
        .where(col("vec_id") =!= col("qid"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("qd")).cast("double").as("adc_d2"))
        .select(col("qid"), col("vec_id").as("vid"), col("adc_d2"))
      val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc_d2"), col("vid"))
      adc.withColumn("rk", row_number().over(wAdc)).where(col("rk") <= 10)
    }
  )
}
