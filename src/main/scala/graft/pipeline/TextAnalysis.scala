package graft.pipeline

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token statistics, quality
  * scoring, language identification, and document fingerprinting.
  *
  * All four are single-pass projections over `documents` — no shuffle at
  * all (grouping happens only if the caller aggregates). Every expression
  * is a codegen'd Spark built-in; arithmetic is integer/ratio based, so the
  * DuckDB oracle matches bit-for-bit.
  */
object TextAnalysis {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  private val enStop = Seq("the", "a", "of", "and", "is")
  private val langMarkers = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "les", "et", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "es", "y"))

  val defs: Seq[QDef] = Seq(

    // ---- Token statistics --------------------------------------------------
    QDef.sql("text_tokens",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS ttr,
        |  CAST(len(replace(text, ' ', '')) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_token_len,
        |  list_max(list_transform(string_split(text, ' '), w -> len(w))) AS max_token_len
        |FROM documents""") { (s, dir) =>
      val ws = split(col("text"), " ")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(ws).as("n_tokens"),
        size(array_distinct(ws)).as("n_distinct"),
        (size(array_distinct(ws)).cast("double") / size(ws)).as("ttr"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") / size(ws)).as("avg_token_len"),
        array_max(transform(ws, w => length(w))).as("max_token_len"))
    },

    // ---- Quality scoring ---------------------------------------------------
    // length/stopword/short-token ratios combined into one score — the
    // standard cheap pre-filter before expensive pipeline stages.
    QDef.sql("text_quality",
      s"""SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '),
        |        w -> list_contains(['the','a','of','and','is'], w))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stop_ratio,
        |  CAST(len(list_filter(string_split(text, ' '), w -> len(w) <= 2)) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS short_frac,
        |  CAST(len(list_filter(string_split(text, ' '), w -> len(w) >= 8)) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS long_frac,
        |  n_chars,
        |  CASE WHEN n_chars BETWEEN 100 AND 400 THEN 1.0 ELSE 0.5 END
        |    * (1.0 - CAST(len(list_filter(string_split(text, ' '), w -> len(w) <= 2)) AS DOUBLE)
        |             / len(string_split(text, ' '))) AS quality
        |FROM documents""") { (s, dir) =>
      val ws = split(col("text"), " ")
      val n = size(ws)
      val stopRatio = size(filter(ws, w => w.isin(enStop: _*))).cast("double") / n
      val shortFrac = size(filter(ws, w => length(w) <= 2)).cast("double") / n
      val longFrac = size(filter(ws, w => length(w) >= 8)).cast("double") / n
      t(s, dir, "documents").select(
        col("doc_id"),
        stopRatio.as("stop_ratio"),
        shortFrac.as("short_frac"),
        longFrac.as("long_frac"),
        col("n_chars"),
        (when(col("n_chars").between(100, 400), 1.0).otherwise(0.5)
          * (lit(1.0) - shortFrac)).as("quality"))
    },

    // ---- Language identification (stopword-marker heuristic) --------------
    QDef.sql("text_langid",
      """WITH hits AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text,' '), w -> list_contains(['the','a','of','and','is'], w))) AS h_en,
        |    len(list_filter(string_split(text,' '), w -> list_contains(['le','la','les','et','une'], w))) AS h_fr,
        |    len(list_filter(string_split(text,' '), w -> list_contains(['der','die','das','und','ist'], w))) AS h_de,
        |    len(list_filter(string_split(text,' '), w -> list_contains(['el','los','las','es','y'], w))) AS h_es
        |  FROM documents
        |)
        |SELECT doc_id, lang, h_en, h_fr, h_de, h_es,
        |  CASE WHEN h_en >= h_fr AND h_en >= h_de AND h_en >= h_es THEN 'en'
        |       WHEN h_fr >= h_de AND h_fr >= h_es THEN 'fr'
        |       WHEN h_de >= h_es THEN 'de' ELSE 'es' END AS predicted
        |FROM hits""") { (s, dir) =>
      val ws = split(col("text"), " ")
      def hitsOf(markers: Seq[String]) = size(filter(ws, w => w.isin(markers: _*)))
      val withHits = t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        hitsOf(langMarkers(0)._2).as("h_en"),
        hitsOf(langMarkers(1)._2).as("h_fr"),
        hitsOf(langMarkers(2)._2).as("h_de"),
        hitsOf(langMarkers(3)._2).as("h_es"))
      withHits.withColumn("predicted",
        when(col("h_en") >= col("h_fr") && col("h_en") >= col("h_de") && col("h_en") >= col("h_es"), "en")
          .when(col("h_fr") >= col("h_de") && col("h_fr") >= col("h_es"), "fr")
          .when(col("h_de") >= col("h_es"), "de").otherwise("es"))
    },

    // ---- Document fingerprint (rolling polynomial hash) --------------------
    // fold over tokens: h' = (h*31 + len(w)*131 + ascii(w)) mod 1e9+7.
    // Fold-from-zero equals DuckDB's fold-from-first-element because
    // (0*31 + c) == c — the recurrences coincide for non-empty docs.
    QDef.sql("text_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_transform(string_split(text, ' '),
        |                   w -> CAST(len(w)*131 + ascii(w) AS BIGINT)),
        |    (a, b) -> (a*31 + b) % 1000000007) AS fp
        |FROM documents WHERE len(text) > 0""") { (s, dir) =>
      val codes = transform(split(col("text"), " "),
        w => (length(w) * 131 + ascii(w)).cast("long"))
      t(s, dir, "documents").where(length(col("text")) > 0).select(
        col("doc_id"),
        aggregate(codes, lit(0L),
          (h, c) => (h * 31 + c) % 1000000007L).as("fp"))
    }
  )
}
