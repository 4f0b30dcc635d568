package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The curation pipeline as a LIBRARY — the composable counterpart of the
  * `pipeline_curation_funnel` registry statement. Each stage is a plain
  * DataFrame → DataFrame transformer so a pipeline owner can compose,
  * reorder, and extend (the funnel query is the monitoring view of this
  * API; CurationSpec pins the two against each other).
  *
  * Stage semantics match the oracled registry ops one-to-one:
  * exact dedup = dedup_exact's min-doc_id keeper rule; the quality screen
  * = pipeline_curation_funnel's token-count + mean-word-length window;
  * PII redaction = text_pii_redact's patterns and replacement order;
  * quota sampling = text_mix_quota's deterministic doc_id draw.
  *
  * Scale: every stage is one shuffle or none — digest aggregate +
  * keeper semi-join (dedup), row-local filters (quality, quota), a
  * codegen'd projection (PII). `run` composes them without ever scanning
  * the corpus twice per stage.
  */
object Curation {

  final case class Config(
      minTokens: Int = 20,
      meanWordLenMin: Double = 3.0,
      meanWordLenMax: Double = 10.0,
      quotaPerLang: Map[String, Int] = Map("en" -> 10, "fr" -> 8, "de" -> 8),
      quotaDefault: Int = 5)

  /** Keep one representative per exact text duplicate (smallest doc_id —
    * dedup_exact's keeper rule). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keepers = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.join(keepers, Seq("doc_id"), "left_semi")
  }

  private def nTokens: Column =
    length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1
  private def meanWordLen: Column =
    length(regexp_replace(col("text"), " ", "")).cast("double") / nTokens

  /** Token-count + mean-word-length screen (the funnel's q_ok flag). */
  def qualityScreen(docs: DataFrame, cfg: Config = Config()): DataFrame =
    docs.where(nTokens >= cfg.minTokens &&
      meanWordLen.between(cfg.meanWordLenMin, cfg.meanWordLenMax))

  /** Mask emails, IPv4s and phone numbers in `text` (text_pii_redact's
    * patterns, same replacement order). */
  def redactPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", TextAnalysis.redactPiiColumn(col("text")))

  /** Deterministic per-language downsampling on the doc_id draw
    * (text_mix_quota's rule): keep doc_id % 10 < quota(lang). */
  def quotaSample(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val quota = cfg.quotaPerLang.foldLeft(lit(cfg.quotaDefault)) {
      case (acc, (lang, q)) => when(col("lang") === lang, q).otherwise(acc)
    }
    docs.where(col("doc_id") % 10 < quota)
  }

  /** The full pass: dedup → quality → quota → PII scrub. */
  def run(docs: DataFrame, cfg: Config = Config()): DataFrame =
    redactPii(quotaSample(qualityScreen(exactDedup(docs), cfg), cfg))

  /** Per-language survivor counts after each stage — the library-side
    * twin of the `pipeline_curation_funnel` registry statement. */
  def funnel(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val deduped = exactDedup(docs)
    val q = qualityScreen(deduped, cfg)
    val fin = quotaSample(q, cfg)
    def counts(df: DataFrame, name: String) =
      df.groupBy(col("lang")).agg(count(lit(1)).as(name))
    counts(docs, "n_raw")
      .join(counts(deduped, "n_dedup"), Seq("lang"), "left")
      .join(counts(q, "n_quality"), Seq("lang"), "left")
      .join(counts(fin, "n_final"), Seq("lang"), "left")
      .na.fill(0L, Seq("n_dedup", "n_quality", "n_final"))
  }
}
