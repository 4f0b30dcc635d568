package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pinned-block hygiene gate (r7 verdict #2/#3): iterative operators
  * that `localCheckpoint` per round must release superseded rounds, and
  * operators that materialize shared relations must memoize an evictable
  * persist — otherwise every re-invocation on a long-lived session (a
  * bench loop locally; a real driver at scale) stacks dead pinned blocks
  * and reps grow monotonically slower (the r7 `dedup_clusters`
  * 3.7→5.4→6.1 s pathology). The observable contract: the persistent-RDD
  * census is FLAT between steady-state invocations.
  */
class CheckpointHygieneSpec extends AnyFunSuite {
  import SparkTestSession._

  private def censusAcrossReps(q: String, reps: Int): Seq[Int] = {
    Tables.registerAll(spark, sfDir)
    (1 to reps).map { _ =>
      SparkEntry.queries(q)(spark, sfDir).collect()
      spark.sparkContext.getPersistentRDDs.size
    }
  }

  // every operator that checkpoints or persists internally
  for (q <- Seq("dedup_clusters", "dedup_ngram_jaccard", "dedup_minhash_lsh",
      "recursive_series", "recursive_closure", "text_contamination",
      "text_boilerplate", "sim_ann_ivf_topk")) {
    test(s"$q: persistent-RDD census is flat across re-invocations") {
      // rep 1 may add memoized materializations + the held result frame;
      // from rep 2 on, each invocation must release what it supersedes
      val counts = censusAcrossReps(q, 3)
      assert(counts(2) <= counts(1),
        s"pinned/persisted blocks grow across reps: $counts")
    }
  }
}
