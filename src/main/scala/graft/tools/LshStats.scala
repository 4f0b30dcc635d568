package graft.tools

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._

/** Scale diagnostic for the minhash-LSH pipeline: candidate-pair count,
  * survivor count, and gram-array mass at a given fixture scale —
  * `runMain graft.tools.LshStats [sfDir]`. These numbers decide the
  * verify-join topology (what may be sorted/shuffled at 100 TB). */
object LshStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-lsh-stats")
    val docs = Tables.t(spark, sfDir, "documents")
    val pairs = graft.pipeline.Dedup.minhashPairs(docs, threshold = 0.8)
    val t0 = System.nanoTime()
    val nSurvivors = pairs.count()
    System.err.println(f"[lsh-stats] full pipeline count: ${(System.nanoTime-t0)/1e9}%.1f s")
    val g = docs.where(length(col("text")) >= 3)
      .select(graft.functions.ShingleHashes.shingle_hashes(col("text")).as("gs"))
    val gramMass = g.agg(sum(size(col("gs")))).head().getLong(0)
    println(s"""{"sfDir":"$sfDir","survivors":$nSurvivors,"gram_mass":$gramMass}""")
    spark.stop()
  }
}
