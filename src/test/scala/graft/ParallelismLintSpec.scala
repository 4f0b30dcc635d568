package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import org.scalatest.funsuite.AnyFunSuite

/** Parallelism lint (r14 VERDICT #2): no registry query may run a heavy
  * scoring stage on a single partition.
  *
  * The trap class this guards against: a broadcast-NL (or cartesian) join
  * whose STREAMED side is the full vector corpus on one split — all
  * per-row vector folds then execute on one core, which is invisible at
  * fixture scale until machine load amplifies it 55× (r14:
  * `sim_quantized_cosine` 48.8 s under load vs 0.88 s isolated). The fix
  * pattern is `corpus.repartition(defaultParallelism)` before the join
  * (Similarity.scala — every sim_* query now does this).
  *
  * Lint rule, applied to every registry query's physical plan (AQE off so
  * the plan is concrete): flag any BroadcastNestedLoopJoinExec /
  * CartesianProductExec whose streamed side
  *   (a) executes in exactly 1 partition,
  *   (b) carries an ArrayType column (vector payload ⇒ per-row scoring
  *       work; scalar theta-joins over one-split fixture scans are cheap
  *       probes whose parallelism at real scale comes from file splits,
  *       so they are NOT flagged), and
  *   (c) has ≥ 400 rows (the embeddings corpus is 500; genuinely small
  *       streamed sides — dims, post-aggregate tables — pass).
  * WindowExec single-partition stages are a separate, accepted class: the
  * registry's global-rank windows all sit over post-aggregate inputs
  * (r14 VERDICT adjudicated `tpcds_s_bestworst` acceptable), so windows
  * are out of scope here by design.
  */
class ParallelismLintSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Streamed (non-broadcast) sides of heavy join nodes in the plan. */
  private def streamedSides(p: SparkPlan): Seq[SparkPlan] = {
    val here: Seq[SparkPlan] = p match {
      case b: BroadcastNestedLoopJoinExec =>
        b.buildSide match {
          case BuildLeft  => Seq(b.right)
          case BuildRight => Seq(b.left)
        }
      case c: CartesianProductExec => Seq(c.left, c.right)
      case _ => Nil
    }
    here ++ p.children.flatMap(streamedSides)
  }

  /** Violations of the lint rule in one DataFrame's physical plan.
    *
    * Plan-static (r15 VERDICT #5): nothing here runs a Spark job. The
    * partition count comes from the RDD lineage (for a file scan that is
    * the split count, computed at planning), and the "is it a real
    * corpus, not a tiny dim" evidence comes from the optimizer's stats —
    * the row-count estimate when available, else the size estimate (the
    * embeddings corpus estimates in the MBs; genuinely small streamed
    * sides — dims, post-aggregate tables — estimate far below the bar).
    * The old lint ran `rdd.count()` on every candidate, re-executing
    * sub-plans across all 330 queries; this covers the same trap class
    * at plan-build cost only (canary below proves it still fires). */
  def lint(df: DataFrame): Seq[String] =
    streamedSides(df.queryExecution.executedPlan).flatMap { s =>
      val hasVector = s.output.exists(_.dataType.isInstanceOf[ArrayType])
      if (!hasVector) None
      else scala.util.Try {
        val nParts = s.execute().getNumPartitions
        // a deliberately-reduced streamed side always carries a row filter
        // (either a FilterExec node or predicates pushed into the scan);
        // the trap shape streams the UNFILTERED corpus scan. Without CBO
        // row counts a Filter doesn't shrink sizeInBytes, so filter
        // presence — not the size estimate — is the static "small side"
        // evidence (at real scale a filtered side on 1 partition means a
        // genuinely tiny result; the corpus would be many file splits).
        // IsNotNull guards inferred from join conditions reach the corpus
        // scan too — only a REAL predicate counts as a reduction
        def realPredicate(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = e match {
          case org.apache.spark.sql.catalyst.expressions.IsNotNull(_) => false
          case a: org.apache.spark.sql.catalyst.expressions.And =>
            realPredicate(a.left) || realPredicate(a.right)
          case _ => true
        }
        val reduced = s.exists {
          case f: org.apache.spark.sql.execution.FilterExec =>
            realPredicate(f.condition)
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.dataFilters.exists(realPredicate)
          case _ => false
        }
        val stats = s.logicalLink.map(_.stats)
        val big = stats.flatMap(_.rowCount).map(_ >= BigInt(400))
          .getOrElse(stats.forall(_.sizeInBytes >= BigInt(100000)))
        if (nParts == 1 && big && !reduced)
          Some(s"1-partition streamed vector corpus (${s.nodeName}: " +
            s"${s.output.map(_.name).mkString(",")})")
        else None
      }.getOrElse(None)
    }

  private def withAqeOff[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("lint catches the unfixed r14 shape (canary)") {
    withAqeOff {
      // sim_quantized_cosine as committed at r14: corpus side built
      // straight off the one-split fixture scan, no repartition
      val e = Tables.t(spark, sfDir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val trap = broadcast(q).join(e, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _).as("dot"))
      assert(lint(trap).nonEmpty, "lint must flag the single-partition corpus BNL")
      // and the fixed shape passes
      val fixed = broadcast(q)
        .join(e.repartition(spark.sparkContext.defaultParallelism),
          col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _).as("dot"))
      assert(lint(fixed).isEmpty, "repartitioned corpus must pass the lint")
    }
  }

  for (d <- SparkEntry.allDefs) {
    test(s"no single-partition vector scoring stage: ${d.name}") {
      withAqeOff {
        val bad = lint(d.fn(spark, sfDir))
        assert(bad.isEmpty, bad.mkString("; "))
      }
    }
  }
}
