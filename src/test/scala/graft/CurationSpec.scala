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

  test("config changes move the knobs: stricter quality keeps fewer docs") {
    val lax = Curation.qualityScreen(docs, Curation.Config(minTokens = 10)).count()
    val strict = Curation.qualityScreen(docs, Curation.Config(minTokens = 60)).count()
    assert(strict < lax)
    val noQuota = Curation.quotaSample(docs,
      Curation.Config(quotaPerLang = Map.empty, quotaDefault = 10)).count()
    assert(noQuota == docs.count())
  }
}
