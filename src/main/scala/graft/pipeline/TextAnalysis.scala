package graft.pipeline

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** PII patterns, restricted to the Java-regex ∩ RE2 subset so the Spark
    * implementation and the DuckDB oracle see identical languages. */
  private val piiEmail = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val piiIp = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private val piiPhone = """\b\d{3}-\d{3}-\d{4}\b"""

  /** The text_pii_redact replacement chain as a reusable Column —
    * email, then IP, then phone (order is part of the contract). */
  def redactPiiColumn(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, piiEmail, "<EMAIL>"),
        piiIp, "<IP>"),
      piiPhone, "<PHONE>")
  private val langMarkers = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "les", "et", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "es", "y"))

  /** Bloom-filter twin of `text_contamination` — the 100 TB screen.
    *
    * The exact screen broadcasts the holdout's DISTINCT gram set; real
    * eval suites push that to GBs, while a Bloom filter is a fixed ~MB
    * whatever the holdout size. This builds the filter with Spark's own
    * BloomFilterAggregate (the machinery behind runtime row-level
    * filters — exchanged as bytes, probed by the codegen'd
    * BloomFilterMightContain, zero UDFs), probes every corpus gram hash,
    * and reports per-doc hit counts. One-sided error by construction:
    * the SAME 64-bit gram hashes feed build and probe, so
    * bloom_hits ≥ exact hits per document (no false negatives) and the
    * overshoot rate is the filter's configured fpp — the soundness
    * contract PipelineSpec pins against the oracle-verified exact op. */
  def contaminationBloom(docs: DataFrame,
      numBits: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val gramsAll = docs.select(col("doc_id"),
      explode(graft.functions.WordGramHashes.word_gram_hashes(col("text"), 8)).as("g"))
    val holdout = gramsAll.where(col("doc_id") % 50 === 0)
    val estItems = Literal(200000L)
    val bloomAgg = GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(col("g")),
        estItems, Literal(numBits)).toAggregateExpression())
    val bloomBytes = holdout.agg(bloomAgg.as("bf"))
      .head().getAs[Array[Byte]](0)
    val probed = GraftBridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes,
        org.apache.spark.sql.types.BinaryType),
      GraftBridge.expression(col("g"))))
    gramsAll.where(col("doc_id") % 50 =!= 0)
      .groupBy(col("doc_id"))
      .agg(sum(when(probed, 1L).otherwise(0L)).as("bloom_hits"),
        count(lit(1)).as("n_grams"))
      .where(col("bloom_hits") > 0)
  }

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

    // ---- BPE-style pre-tokenizer counts -----------------------------------
    // Token counting at the granularity an LLM tokenizer sees: the GPT-2
    // pre-tokenizer regex family (contraction suffixes, space-prefixed
    // letter/digit runs, punctuation runs, whitespace) minus the trailing
    // lookahead (RE2 has no lookahead; Java and RE2 agree leftmost-first
    // on this alternation). pieces/word is the fertility proxy used for
    // token-budget planning. One codegen'd projection, no explode.
    QDef.sql("text_bpe_tokens",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +')) AS n_bpe_pieces,
        |  CAST(len(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +')) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS fertility
        |FROM documents""") { (s, dir) =>
      val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"
      val pieces = size(regexp_extract_all(col("text"), lit(pat), lit(0)))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        pieces.as("n_bpe_pieces"),
        (pieces.cast("double") / size(split(col("text"), " "))).as("fertility"))
    },

    // ---- Character-entropy quality signal ---------------------------------
    // Shannon entropy of the per-document character distribution — the
    // classic cheap detector for degenerate text (repeated chars, binary
    // junk, keyboard mash score far from natural-language ~4.1 bits).
    // Determinism: each (doc, char) term -p·log2(p) is a transcendental —
    // rounded to 9 decimals (the repo contract for JVM-vs-libm last-ulp
    // skew) THEN decimal-summed, so the per-doc fold is order-independent
    // under any partitioning. Scale: one explode (linear in corpus chars),
    // two partial-agg shuffles on doc_id — no joins beyond the count
    // broadcast-sized per doc.
    QDef.sql("text_char_entropy",
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |freq AS (
        |  SELECT doc_id, ch, COUNT(*) AS c FROM ch
        |  WHERE ch <> '' GROUP BY doc_id, ch),
        |n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM freq GROUP BY doc_id),
        |terms AS (
        |  SELECT f.doc_id,
        |    CAST(round(-(CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n), 9)
        |      AS DECIMAL(28,12)) AS term
        |  FROM freq f JOIN n ON f.doc_id = n.doc_id)
        |SELECT doc_id, round(CAST(SUM(term) AS DOUBLE), 9) AS entropy
        |FROM terms GROUP BY doc_id""") { (s, dir) =>
      val chars = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .where(col("ch") =!= "")
      val freq = chars.groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("c"))
      val n = freq.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
      val p = col("c").cast("double") / col("n")
      freq.join(n, "doc_id")
        .select(col("doc_id"),
          round(-p * log2(p), 9)
            .cast(org.apache.spark.sql.types.DecimalType(28, 12)).as("term"))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("term")).cast("double"), 9).as("entropy"))
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

    // ---- Language-ID evaluation (confusion matrix) -------------------------
    // The classifier-eval harness IN the engine: text_langid's prediction
    // against the corpus's ground-truth lang as an (actual, predicted, n)
    // confusion matrix — note the fixture carries languages the 4-class
    // marker model cannot name (zh), so the matrix shows real
    // out-of-vocabulary confusion, exactly what a pipeline owner monitors
    // before trusting a quota stage keyed on predicted language.
    // One projection + one aggregate; no shuffle beyond the rollup.
    QDef.sql("text_langid_eval",
      """WITH hits AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text,' '), w -> list_contains(['the','a','of','and','is'], w))) AS h_en,
        |    len(list_filter(string_split(text,' '), w -> list_contains(['le','la','les','et','une'], w))) AS h_fr,
        |    len(list_filter(string_split(text,' '), w -> list_contains(['der','die','das','und','ist'], w))) AS h_de,
        |    len(list_filter(string_split(text,' '), w -> list_contains(['el','los','las','es','y'], w))) AS h_es
        |  FROM documents
        |), pred AS (
        |  SELECT lang AS actual,
        |    CASE WHEN h_en >= h_fr AND h_en >= h_de AND h_en >= h_es THEN 'en'
        |         WHEN h_fr >= h_de AND h_fr >= h_es THEN 'fr'
        |         WHEN h_de >= h_es THEN 'de' ELSE 'es' END AS predicted
        |  FROM hits)
        |SELECT actual, predicted, COUNT(*) AS n,
        |  CAST(COUNT(*) AS DOUBLE)
        |    / SUM(COUNT(*)) OVER (PARTITION BY actual) AS frac_of_actual
        |FROM pred GROUP BY actual, predicted""") { (s, dir) =>
      val ws = split(col("text"), " ")
      def hitsOf(markers: Seq[String]) = size(filter(ws, w => w.isin(markers: _*)))
      val pred = t(s, dir, "documents").select(
          col("lang").as("actual"),
          hitsOf(langMarkers(0)._2).as("h_en"),
          hitsOf(langMarkers(1)._2).as("h_fr"),
          hitsOf(langMarkers(2)._2).as("h_de"),
          hitsOf(langMarkers(3)._2).as("h_es"))
        .withColumn("predicted",
          when(col("h_en") >= col("h_fr") && col("h_en") >= col("h_de") && col("h_en") >= col("h_es"), "en")
            .when(col("h_fr") >= col("h_de") && col("h_fr") >= col("h_es"), "fr")
            .when(col("h_de") >= col("h_es"), "de").otherwise("es"))
      val counts = pred.groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("actual"))
      counts.select(col("actual"), col("predicted"), col("n"),
        (col("n").cast("double") / sum(col("n")).over(w)).as("frac_of_actual"))
    },

    // ---- Repetition metrics (Gopher-style quality rules) -------------------
    // Per-document repetition statistics of the kind large-corpus filters
    // gate on: the fraction of tokens covered by the single most frequent
    // word bigram, the fraction of duplicated trigram slots, mean word
    // length, and a composite keep/drop flag. The top-bigram count runs as
    // explode → two-level aggregation (partial map-side combine, shuffle
    // keyed on doc_id) rather than a per-doc O(L²) array scan, so it stays
    // linear in corpus size for arbitrarily long documents; the trigram
    // ratio is per-row array hashing (O(L)), shuffle-free.
    QDef.sql("text_repetition",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents),
        |bc AS (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |      i -> ws[i] || ' ' || ws[i+1])) AS g FROM w)
        |  GROUP BY doc_id, g),
        |bm AS (SELECT doc_id, max(c) AS max_bi FROM bc GROUP BY doc_id)
        |SELECT w.doc_id,
        |  len(ws) AS n_tokens,
        |  CAST(2 * max_bi AS DOUBLE) / len(ws) AS top_bigram_frac,
        |  CAST(len(ws) - 2 - len(list_distinct(list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS DOUBLE)
        |    / greatest(len(ws) - 2, 1) AS dup_trigram_frac,
        |  CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(ws) AS mean_word_len,
        |  len(ws) >= 40
        |    AND CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(ws) BETWEEN 3 AND 10
        |    AND CAST(2 * max_bi AS DOUBLE) / len(ws) < 0.2
        |    AND CAST(len(ws) - 2 - len(list_distinct(list_transform(range(1, len(ws) - 1),
        |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS DOUBLE)
        |        / greatest(len(ws) - 2, 1) < 0.5 AS gopher_keep
        |FROM w JOIN bm USING (doc_id)""") { (s, dir) =>
      val ws = split(col("text"), " ")
      val docs = t(s, dir, "documents")
      // Gram equality runs on 64-bit WordGramHashes (the text_contamination
      // kernel) instead of materialized gram strings: the explode carries
      // 8-byte longs and the per-row distinct-trigram count is one codegen'd
      // pass. Collisions are 2^-64 per pair; the output exposes only counts,
      // so the string-gram DuckDB oracle is unchanged.
      val maxBi = docs
        .select(col("doc_id"),
          explode(graft.functions.WordGramHashes.word_gram_hashes_all(col("text"), 2)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("max_bi"))
      val nTokens = size(ws)
      val meanLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTokens
      // greatest(n-2, 1): a 1-2 token doc has zero trigram slots and a
      // zero numerator — the guard keeps the fraction 0 instead of NaN
      val dupTri = ((nTokens - 2
        - size(graft.functions.WordGramHashes.word_gram_hashes(col("text"), 3))).cast("double")
        / greatest(nTokens - 2, lit(1)))
      val base = docs.select(col("doc_id"), nTokens.as("n_tokens"),
        meanLen.as("mean_word_len"), dupTri.as("dup_trigram_frac"))
      base.join(maxBi, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          ((col("max_bi") * 2).cast("double") / col("n_tokens")).as("top_bigram_frac"),
          col("dup_trigram_frac"), col("mean_word_len"),
          (col("n_tokens") >= 40 && col("mean_word_len").between(3, 10)
            && (col("max_bi") * 2).cast("double") / col("n_tokens") < 0.2
            && col("dup_trigram_frac") < 0.5).as("gopher_keep"))
    },

    // ---- Benchmark contamination (n-gram overlap vs a holdout set) ---------
    // Flags corpus documents sharing any word-8-gram with a "benchmark"
    // holdout (here: doc_id % 50 = 0 — in production, the eval sets).
    // Scale shape: the benchmark gram set is small by nature → broadcast;
    // the corpus side explodes per-doc DISTINCT grams (linear in corpus
    // tokens), joins the broadcast set, and aggregates hit counts keyed on
    // doc_id. The corpus is never self-joined and nothing collects.
    // Grams are hashed to 64-bit longs in one native pass (WordGramHashes —
    // no ~40-byte gram string is ever built; the explode/broadcast carry
    // 8 bytes per gram) and the gram relation is persisted per invocation
    // so the holdout-build and probe sides share ONE scan+explode, not two.
    // The hash never reaches the output (only per-doc hit counts do), so
    // the string-gram DuckDB oracle still hash-matches exactly.
    QDef.sql("text_contamination",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 6),
        |    i -> array_to_string(ws[i:i+7], ' ')))) AS g FROM w),
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
        |hits AS (
        |  SELECT doc_id, count(*) AS c FROM g JOIN bench USING (g)
        |  WHERE doc_id % 50 <> 0 GROUP BY doc_id)
        |SELECT w.doc_id, coalesce(c, 0) AS n_hit_grams, coalesce(c, 0) > 0 AS contaminated
        |FROM w LEFT JOIN hits USING (doc_id) WHERE w.doc_id % 50 <> 0""") { (s, dir) =>
      val grams8 = graft.functions.WordGramHashes.word_gram_hashes(col("text"), 8)
      val docs = t(s, dir, "documents")
      // per-invocation evictable persist, not localCheckpoint: pinned
      // checkpoint blocks accumulate one copy per invocation (the r7 rep
      // growth); the persist shares ONE materialization between the
      // holdout-build and probe sides of THIS invocation (superseding the
      // previous invocation's), and recompute stays possible on eviction
      val gramRows = graft.Checkpoints.materialized(docs, "wordgrams-8")(
        docs.select(col("doc_id"), explode(grams8).as("g")))
      val bench = gramRows.where(col("doc_id") % 50 === 0)
        .select(col("g")).distinct()
      val hits = gramRows.where(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      docs.where(col("doc_id") % 50 =!= 0).select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("c"), lit(0L)).as("n_hit_grams"),
          (coalesce(col("c"), lit(0L)) > 0).as("contaminated"))
    },

    // ---- Corpus-frequency boilerplate screen (C4/RefinedWeb-style) ---------
    // The other direction from contamination: grams frequent across the
    // CORPUS ITSELF (document frequency > K distinct docs) mark boilerplate;
    // a document is dropped when too much of it is corpus-frequent. Scale
    // shape: one explode of hashed 5-grams (8 bytes/gram), document
    // frequency by two-level aggregate, join back on the gram hash, per-doc
    // re-aggregate — the corpus is never self-joined, nothing collects, and
    // the gram relation is checkpointed so the df-count and probe sides
    // share one scan. Hashes never reach the output (counts only), so the
    // string-gram DuckDB oracle matches exactly.
    QDef.sql("text_boilerplate",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
        |    i -> array_to_string(ws[i:i+4], ' '))) AS gram FROM w),
        |df AS (SELECT gram, count(DISTINCT doc_id) AS dfreq FROM g GROUP BY gram),
        |per AS (
        |  SELECT doc_id, count(*) AS n_grams,
        |    CAST(coalesce(sum(CASE WHEN dfreq > 5 THEN 1 ELSE 0 END), 0) AS BIGINT) AS frequent
        |  FROM g JOIN df USING (gram) GROUP BY doc_id)
        |SELECT doc_id, n_grams, frequent,
        |  CAST(frequent AS DOUBLE) / n_grams AS boiler_frac,
        |  CAST(frequent AS DOUBLE) / n_grams < 0.3 AS keep
        |FROM per""") { (s, dir) =>
      val docs = t(s, dir, "documents")
      // per-invocation evictable persist (two consumers: the doc-frequency
      // aggregate and the per-doc join) — see text_contamination's grams
      val grams = graft.Checkpoints.materialized(docs, "wordgrams-all-5")(
        docs.select(col("doc_id"),
          explode(graft.functions.WordGramHashes.word_gram_hashes_all(col("text"), 5)).as("g")))
      val dfreq = grams.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("dfreq"))
      val per = grams.join(dfreq, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("dfreq") > 5, 1L).otherwise(0L)).as("frequent"))
      per.select(col("doc_id"), col("n_grams"), col("frequent"),
        (col("frequent").cast("double") / col("n_grams")).as("boiler_frac"),
        (col("frequent").cast("double") / col("n_grams") < 0.3).as("keep"))
    },

    // ---- Corpus mixing: deterministic per-language sampling quotas ---------
    // The data-mixing stage of a training pipeline: each language stratum
    // downsamples to a target rate via a deterministic per-document uniform
    // draw (Knuth multiplicative hash of doc_id into [0,1000)), so the mix
    // is bit-reproducible across engines, partitionings and reruns — no
    // PRNG state, unlike TABLESAMPLE. Shuffle-free single scan; the summary
    // reports per-language kept/total so quota adherence is part of the
    // compared output.
    QDef.common("text_mix_quota",
      """SELECT lang, COUNT(*) AS total,
        |  CAST(SUM(CASE WHEN (doc_id * 2654435761) % 1000 <
        |    CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 600
        |              WHEN 'es' THEN 750 ELSE 1000 END
        |    THEN 1 ELSE 0 END) AS BIGINT) AS kept
        |FROM documents
        |GROUP BY lang"""),

    // ---- Corpus mixing: epoch upsampling (weights > 1) ---------------------
    // The other half of mixing: strata weighted ABOVE 1.0 replicate
    // ceil(w)-fold (explode of a generated epoch index — the fan-out is a
    // generator, never a self-join) and the last fractional epoch keeps a
    // deterministic per-(doc, epoch) subset with the same multiplicative
    // draw as text_mix_quota. en×1.0, fr×2.5, de×2.0, es×1.25, zh×0.5:
    // output is one row per kept replica, fully reproducible.
    QDef.sql("text_mix_epochs",
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    CASE lang WHEN 'fr' THEN 2.5 WHEN 'de' THEN 2.0
        |              WHEN 'es' THEN 1.25 WHEN 'zh' THEN 0.5 ELSE 1.0 END AS wt
        |  FROM documents),
        |rep AS (
        |  SELECT doc_id, lang, wt, unnest(range(0, CAST(ceil(wt) AS INT))) AS epoch
        |  FROM w)
        |SELECT doc_id, lang, CAST(epoch AS INT) AS epoch FROM rep
        |WHERE epoch < wt - 1
        |   OR (doc_id * 2654435761 + epoch * 97) % 1000 < (wt - floor(wt)) * 1000
        |   OR (wt = floor(wt) AND epoch < wt)
        |ORDER BY doc_id, epoch""") { (s, dir) =>
      val docs = t(s, dir, "documents")
      val wt = when(col("lang") === "fr", 2.5).when(col("lang") === "de", 2.0)
        .when(col("lang") === "es", 1.25).when(col("lang") === "zh", 0.5)
        .otherwise(1.0)
      docs.select(col("doc_id"), col("lang"), wt.as("wt"))
        .select(col("doc_id"), col("lang"), col("wt"),
          explode(sequence(lit(0), ceil(col("wt")).cast("int") - 1)).as("epoch"))
        .where(col("epoch") < col("wt") - 1
          || (col("doc_id") * 2654435761L + col("epoch") * 97) % 1000 <
             (col("wt") - floor(col("wt"))) * 1000
          || (col("wt") === floor(col("wt")) && col("epoch") < col("wt")))
        .select(col("doc_id"), col("lang"), col("epoch").cast("int").as("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
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
    },

    // ---- End-to-end curation funnel ---------------------------------------
    // The whole curation pass as ONE dual-engine statement — what a
    // pipeline owner actually monitors: per-language survivor counts
    // through exact dedup (md5 keeper, dedup_exact's rule), a quality
    // screen (token count + mean word length, the text_quality core), and
    // per-language quota sampling on the deterministic doc_id draw
    // (text_mix_quota's rule). Flags compose monotonically, so the row
    // counts form the retention funnel raw ⊇ dedup ⊇ quality ⊇ final.
    // Scale shape: one digest aggregate (shuffle 1), a semi-join back on
    // doc_id (shuffle 2, or broadcast when the keeper set is small per
    // AQE), flag arithmetic row-local, final rollup on lang — the fact
    // table is never scanned twice.
    QDef.common("pipeline_curation_funnel",
      """WITH keeper AS (
        |  SELECT MIN(doc_id) AS kid FROM documents GROUP BY md5(text)
        |),
        |flags AS (
        |  SELECT lang, doc_id,
        |    CASE WHEN doc_id IN (SELECT kid FROM keeper) THEN 1 ELSE 0 END AS keep_dedup,
        |    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 20
        |          AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |              / (length(text) - length(replace(text, ' ', '')) + 1)
        |              BETWEEN 3 AND 10
        |         THEN 1 ELSE 0 END AS q_ok,
        |    CASE WHEN doc_id % 10 <
        |           CASE lang WHEN 'en' THEN 10 WHEN 'fr' THEN 8
        |                     WHEN 'de' THEN 8 ELSE 5 END
        |         THEN 1 ELSE 0 END AS quota_ok
        |  FROM documents
        |)
        |SELECT lang, COUNT(*) AS n_raw,
        |  CAST(SUM(keep_dedup) AS BIGINT) AS n_dedup,
        |  CAST(SUM(keep_dedup * q_ok) AS BIGINT) AS n_quality,
        |  CAST(SUM(keep_dedup * q_ok * quota_ok) AS BIGINT) AS n_final,
        |  CAST(SUM(keep_dedup * q_ok * quota_ok) AS DOUBLE) / COUNT(*) AS retention
        |FROM flags GROUP BY lang"""),

    // ---- Temperature-based source mixing ----------------------------------
    // Derive the training mixture FROM the corpus counts — the
    // temperature-sampling formula (multilingual-LM data-balancing:
    // p_s ∝ c_s^α upweights small sources; α=1 is proportional, α=0
    // uniform). α is fixed at 0.5 so the power is sqrt — IEEE-exact and
    // identical on both engines, unlike pow's last-ulp skew; each sqrt is
    // rounded to 9 decimals and the normalizing sum runs in DECIMAL, so
    // shares are order-independent under any partitioning (the
    // text_char_entropy determinism pattern). Complements text_mix_quota /
    // text_mix_epochs, which APPLY given weights; this op computes them.
    // Scale shape: one count aggregate, then arithmetic over |sources|
    // rows — the unpartitioned window runs on the tiny aggregate, never
    // the corpus.
    QDef.sql("text_mix_temperature",
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |t AS (SELECT source, n_docs,
        |        CAST(round(sqrt(n_docs), 9) AS DECIMAL(18,9)) AS sq FROM s)
        |SELECT source, n_docs,
        |  CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS raw_share,
        |  CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE) AS temp_share,
        |  (CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE))
        |    / (CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()) AS boost
        |FROM t""") { (s, dir) =>
      val w = Window.partitionBy()
      val base = t(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("sq", round(sqrt(col("n_docs")), 9).cast(DecimalType(18, 9)))
      val rawShare = col("n_docs").cast("double") / sum(col("n_docs")).over(w)
      val tempShare = col("sq").cast("double") / sum(col("sq")).over(w).cast("double")
      base.select(col("source"), col("n_docs"),
        rawShare.as("raw_share"), tempShare.as("temp_share"),
        (tempShare / rawShare).as("boost"))
    },

    // ---- Token-window chunking (context-length preparation) ---------------
    // Split every document into overlapping token windows — the step that
    // turns raw documents into embedding/training inputs bounded by a
    // model's context length. Chunk size 64, stride 48 (16-token overlap so
    // no boundary sentence is seen by zero chunks); the final chunk is the
    // natural remainder. Each chunk carries its token count and the same
    // rolling fingerprint text_fingerprint uses, so downstream exact-dedup
    // can run at CHUNK granularity. Scale shape: one explode of ~n/stride
    // rows per doc, no shuffle at all — chunking is a scan-speed
    // projection however large the corpus.
    QDef.sql("text_chunks",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (
        |  SELECT doc_id, CAST((i - 1) / 48 AS BIGINT) AS chunk_idx,
        |    ws[i:least(i + 63, len(ws))] AS cs
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1, 48)) AS i) r)
        |SELECT doc_id, chunk_idx, len(cs) AS n_chunk_tokens,
        |  list_reduce(
        |    list_transform(cs, t -> CAST(len(t)*131 + ascii(t) AS BIGINT)),
        |    (a, b) -> (a*31 + b) % 1000000007) AS chunk_fp
        |FROM c""") { (s, dir) =>
      val ws = split(col("text"), " ")
      val chunks = t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(1), size(ws), lit(48)),
            start => slice(ws, start, lit(64)))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          col("col").as("cs"))
      val codes = transform(col("cs"), w2 => (length(w2) * 131 + ascii(w2)).cast("long"))
      chunks.select(col("doc_id"), col("chunk_idx"),
        size(col("cs")).as("n_chunk_tokens"),
        aggregate(codes, lit(0L), (h, c) => (h * 31 + c) % 1000000007L).as("chunk_fp"))
    },

    // ---- PII detection + redaction ----------------------------------------
    // The scrub pass every training corpus runs before anything else:
    // detect and mask emails / IPv4 addresses / phone numbers. The fixture
    // text is synthetic word-salad with no organic PII, so the query first
    // plants deterministic surrogates derived from doc_id (emails on
    // doc_id%3=0, IPs on %4=0, phones on %5=0 — overlapping residues give
    // multi-type docs and %60 gaps give clean docs), then detects and
    // redacts them — the redacted text itself is part of the hash, so the
    // oracle pins the full replacement semantics, not just counts.
    // Patterns stay in the Java-regex ∩ RE2 subset (char classes, bounded
    // repetition, \b, \d — no lookaround), so Spark's codegen'd
    // regexp_replace and DuckDB's RE2 agree byte-for-byte; DuckDB needs
    // the explicit 'g' flag to match Spark's replace-all default.
    // Scale shape: pure single-pass projection, zero shuffle, all
    // WholeStageCodegen — at 100 TB this runs at scan speed.
    QDef.sql("text_pii_redact",
      s"""WITH aug AS (
        |  SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@mail'
        |           || (doc_id % 7) || '.com' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || (doc_id % 256) || '.0.'
        |           || (doc_id % 100) || ' net' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' call ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |           || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |      AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '$piiEmail')) AS n_email,
        |  len(regexp_extract_all(t, '$piiIp')) AS n_ip,
        |  len(regexp_extract_all(t, '$piiPhone')) AS n_phone,
        |  len(regexp_extract_all(t, '$piiEmail')) + len(regexp_extract_all(t, '$piiIp'))
        |    + len(regexp_extract_all(t, '$piiPhone')) = 0 AS pii_free,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '$piiEmail', '<EMAIL>', 'g'), '$piiIp', '<IP>', 'g'),
        |    '$piiPhone', '<PHONE>', 'g') AS redacted
        |FROM aug""") { (s, dir) =>
      val aug = concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@mail"),
            (col("doc_id") % 7).cast("string"), lit(".com"))).otherwise(""),
        when(col("doc_id") % 4 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
            (col("doc_id") % 100).cast("string"), lit(" net"))).otherwise(""),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call "), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(""))
      def cnt(c: Column, re: String): Column =
        size(regexp_extract_all(c, lit(re), lit(0)))
      t(s, dir, "documents")
        .select(col("doc_id"), aug.as("t"))
        .select(col("doc_id"),
          cnt(col("t"), piiEmail).as("n_email"),
          cnt(col("t"), piiIp).as("n_ip"),
          cnt(col("t"), piiPhone).as("n_phone"),
          (cnt(col("t"), piiEmail) + cnt(col("t"), piiIp)
            + cnt(col("t"), piiPhone) === 0).as("pii_free"),
          redactPiiColumn(col("t")).as("redacted"))
    }
  )
}
