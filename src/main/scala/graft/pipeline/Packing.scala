package graft.pipeline

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — the training-batch construction step of an LLM data
  * pipeline: documents are packed first-fit-consecutive into fixed
  * token-budget bins (each pretraining example is a bin, padding waste =
  * budget - fill). Greedy packing is inherently sequential, so the
  * distributed shape is: partition the corpus into FIXED doc_id ranges
  * (deterministic, independent of parallelism), pack each range's
  * documents in doc_id order inside one task, and namespace bin ids by
  * range. One shuffle on the range key; per-task state is one counter —
  * at 100 TB each range packs independently on its executor, and the
  * fixed-width ranges keep results bit-identical under any cluster
  * layout (the same reproducibility discipline as the hash sample).
  * An oversized document gets a bin of its own (first-fit never splits).
  */
object Packing {

  /** Greedy first-fit-consecutive packing of (doc_id, n_tokens) rows into
    * bins of `budget` tokens within fixed `rangeWidth` doc_id ranges.
    * Output: (doc_id, n_tokens, bin_id, fill_after). */
  def packGreedy(docs: DataFrame, budget: Long, rangeWidth: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[(Long, Long)]
      .groupByKey(_._1 / rangeWidth)
      .flatMapGroups { (range: Long, it: Iterator[(Long, Long)]) =>
        val rows = it.toIndexedSeq.sortBy(_._1)
        var fill = 0L
        var bin = 0L
        rows.iterator.map { case (id, nt) =>
          if (fill > 0 && fill + nt > budget) { bin += 1; fill = 0L }
          fill += nt
          (id, nt, range * 100000L + bin, fill)
        }
      }
      .toDF("doc_id", "n_tokens", "bin_id", "fill_after")
  }

  val defs: Seq[QDef] = Seq(
    // Budget 256 tokens, range width 100 docs. Oracle: DuckDB replays the
    // same greedy recurrence with a recursive CTE over the per-range
    // row_number chain — exact BIGINT arithmetic on both engines.
    QDef.sql("text_pack_bins",
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         doc_id // 100 AS rng,
        |         row_number() OVER (PARTITION BY doc_id // 100 ORDER BY doc_id) AS rn
        |  FROM documents
        |), packed AS (
        |  SELECT rng, rn, doc_id, n_tokens,
        |         CAST(0 AS BIGINT) AS bin, n_tokens AS fill
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rng, d.rn, d.doc_id, d.n_tokens,
        |    CASE WHEN p.fill + d.n_tokens > 256 THEN p.bin + 1 ELSE p.bin END,
        |    CASE WHEN p.fill + d.n_tokens > 256 THEN d.n_tokens
        |         ELSE p.fill + d.n_tokens END
        |  FROM d JOIN packed p ON d.rng = p.rng AND d.rn = p.rn + 1
        |)
        |SELECT doc_id, n_tokens, rng * 100000 + bin AS bin_id, fill AS fill_after
        |FROM packed""") { (s, dir) =>
      packGreedy(Tables.t(s, dir, "documents"), budget = 256L, rangeWidth = 100L)
    }
  )
}
