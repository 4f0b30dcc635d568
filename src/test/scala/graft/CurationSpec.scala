package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Curation library API against its oracled monitoring twin: the
  * per-stage funnel must equal the `pipeline_curation_funnel` registry
  * statement (which the DuckDB gate verifies), and the composed run must
  * deliver exactly the funnel's n_final documents, scrubbed. */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = Tables.t(spark, sfDir, "documents")

  test("library funnel equals the oracled SQL funnel per language") {
    val sqlRows = SparkEntry.queries("pipeline_curation_funnel")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val libRows = Curation.funnel(docs)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(libRows == sqlRows)
  }

  test("run delivers exactly the funnel's n_final documents, PII-scrubbed") {
    val out = Curation.run(docs)
    val nFinal = Curation.funnel(docs)
      .agg(sum(col("n_final"))).collect().head.getLong(0)
    assert(out.count() == nFinal)
    // stages are monotone filters over the same id space
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(all))
    // the PII scrub ran: no pattern survives in the delivered text
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    out.select("text").collect().map(_.getString(0)).foreach { t =>
      assert(emailRe.findFirstIn(t).isEmpty)
    }
  }

  test("the curation screen runs on a STREAM: screened ids equal batch") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val stream = graft.streaming.StreamOps.readDocumentsStream(spark, sfDir)
    // stateless screen stages compose on the unbounded source unchanged;
    // stateful exact-dedup becomes dropDuplicates on the digest
    val screened = Curation.quotaSample(
        Curation.qualityScreen(Curation.redactPii(stream)))
      .dropDuplicates("text")
      .select("doc_id")
    val q = screened.writeStream.format("memory").queryName("t_curate")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()
    val got = spark.table("t_curate").collect().map(_.getLong(0)).toSet
    val want = Curation.quotaSample(Curation.qualityScreen(
        Curation.redactPii(docs))).dropDuplicates("text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // fixture texts are unique, so any dedup keeper choice yields the
    // same id set — streaming and batch must agree exactly
    assert(got == want && got.nonEmpty)
  }

  test("config changes move the knobs: stricter quality keeps fewer docs") {
    val lax = Curation.qualityScreen(docs, Curation.Config(minTokens = 10)).count()
    val strict = Curation.qualityScreen(docs, Curation.Config(minTokens = 60)).count()
    assert(strict < lax)
    val noQuota = Curation.quotaSample(docs,
      Curation.Config(quotaPerLang = Map.empty, quotaDefault = 10)).count()
    assert(noQuota == docs.count())
  }
}
