package graft.tools

import graft.{Engine, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived-scale fixture generator (r9 VERDICT ask #1): union-replicate
  * the sf0.1 fixtures into a data-dominant scale where fixed scheduling /
  * codegen overhead no longer hides an operator's true growth exponent —
  * the measured leg of the 100 TB argument in SCALING.md.
  *
  * Replication semantics — each copy is a NEW CRAWL BATCH, not a clone:
  *   - every key column shifts by copy × stride (stride = the next power
  *     of ten above the source max, so copies never collide);
  *   - FK families shift together (orders.o_orderkey and
  *     lineitem.l_orderkey use the same stride and copy index), so join
  *     cardinalities per copy are identical to sf0.1;
  *   - bounded real-world dimensions (region, nation) are NOT replicated —
  *     there are 25 nations at any corpus size;
  *   - blocking attributes that scale with corpus size in reality scale
  *     here too: `documents.source` and `embeddings.label` are remapped
  *     per copy (a new crawl has new source ids), so blocked operators'
  *     block COUNT grows and block SIZE stays fixed — the workload shape
  *     a linear-growth measurement must preserve;
  *   - document text goes through a per-copy LETTER-SUBSTITUTION cipher:
  *     a bijection on characters is a bijection on trigram shingles, so
  *     every within-copy Jaccard similarity / minhash signature
  *     relationship of sf0.1 is preserved EXACTLY, while no similarity
  *     STRUCTURE is preserved across copies — distinct ciphers yield no
  *     exact cross-copy duplicates and no manufactured near-dups
  *     (incidental low-Jaccard trigram overlap between differently-
  *     ciphered copies is possible but carries no structure). Length is
  *     preserved, so n_chars stays valid and per-document work is
  *     identical to sf0.1. The cipher family has 104 distinct members
  *     (identity at k = 0), so docFactor is capped at 104 — beyond that,
  *     reused ciphers would create exact cross-copy duplicates;
  *   - embeddings get a small deterministic per-copy jitter (hash-seeded,
  *     copy 0 pristine) so no two vectors are bit-identical.
  *
  * Copy 0 is always the untouched sf0.1 data.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [outDir] [tpchFactor] [docFactor]
  * Defaults: /root/testdata/sf0.1 target/scale/sf1eq 10 100
  * (lineitem 600k → 6M rows; documents 5k → 500k; embeddings 2k → 200k.)
  */
object ScaleUp {

  /** Next power of ten strictly above m — the per-copy key stride. */
  def stride(m: Long): Long = {
    var s = 10L
    while (s <= m) s *= 10
    s
  }

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  /** Per-copy alphabet permutation: rotation by (k mod 26) composed with
    * one of four fixed scrambles chosen by (k div 26) — 104 distinct
    * bijections, identity at k = 0. Applied to both cases via translate()
    * (codegen'd; digits/punctuation/whitespace pass through, so word and
    * shingle STRUCTURE is preserved and only identity changes). */
  def cipherTo(k: Int): String = {
    def rot(s: String, r: Int): String = s.drop(r) + s.take(r)
    def scramble(s: String, v: Int): String = v % 4 match {
      case 0 => s
      case 1 => s.reverse
      case 2 => // even positions then odd positions
        s.indices.collect { case i if i % 2 == 0 => s(i) }.mkString +
          s.indices.collect { case i if i % 2 == 1 => s(i) }.mkString
      case 3 => (s.indices.collect { case i if i % 2 == 0 => s(i) }.mkString +
        s.indices.collect { case i if i % 2 == 1 => s(i) }.mkString).reverse
    }
    val lo = scramble(rot(Lower, k % 26), k / 26)
    lo + lo.toUpperCase
  }
  val cipherFrom: String = Lower + Upper

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/scale/sf1eq")
    val tpchFactor = args.lift(2).map(_.toInt).getOrElse(10)
    val docFactor = args.lift(3).map(_.toInt).getOrElse(100)
    val spark = Engine.session("graft-scaleup")
    run(spark, src, out, tpchFactor, docFactor)
    spark.stop()
    println(s"""{"scaleup":"done","out":"$out","tpchFactor":$tpchFactor,"docFactor":$docFactor}""")
  }

  /** Generate the derived-scale fixture set (spec-callable: does not own
    * or stop the session). */
  def run(spark: SparkSession, src: String, out: String,
      tpchFactor: Int, docFactor: Int): Unit = {
    require(docFactor <= 104,
      s"docFactor $docFactor > 104: the substitution-cipher family has only " +
        "104 distinct bijections; reusing one would create exact cross-copy " +
        "duplicate texts, violating the fixture contract")

    def maxOf(name: String, c: String): Long =
      Tables.t(spark, src, name).agg(max(col(c))).head().getLong(0)
    val ordStride = stride(maxOf("orders", "o_orderkey"))
    val custStride = stride(maxOf("customer", "c_custkey"))
    val partStride = stride(maxOf("part", "p_partkey"))
    val suppStride = stride(maxOf("supplier", "s_suppkey"))
    val docStride = stride(maxOf("documents", "doc_id"))
    val vecStride = stride(maxOf("embeddings", "vec_id"))
    val evtStride = stride(maxOf("events", "event_id"))
    val userStride = stride(maxOf("events", "user_id"))

    /** Replicate `factor`× with a per-copy column transform. */
    def replicate(name: String, factor: Int)(tf: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = Tables.t(spark, src, name)
      (0 until factor).map(k => tf(base, k)).reduce(_ unionByName _)
    }
    def shift(c: String, s: Long, k: Int) = col(c) + lit(s * k)

    def write(df: DataFrame, name: String, parts: Int): Unit = {
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      System.err.println(s"[scaleup] wrote $name")
    }

    // bounded dimensions: verbatim
    write(Tables.t(spark, src, "region"), "region", 1)
    write(Tables.t(spark, src, "nation"), "nation", 1)

    write(replicate("customer", tpchFactor) { (d, k) =>
      d.withColumn("c_custkey", shift("c_custkey", custStride, k))
    }, "customer", 8)
    write(replicate("supplier", tpchFactor) { (d, k) =>
      d.withColumn("s_suppkey", shift("s_suppkey", suppStride, k))
    }, "supplier", 1)
    write(replicate("part", tpchFactor) { (d, k) =>
      d.withColumn("p_partkey", shift("p_partkey", partStride, k))
    }, "part", 8)
    write(replicate("orders", tpchFactor) { (d, k) =>
      d.withColumn("o_orderkey", shift("o_orderkey", ordStride, k))
        .withColumn("o_custkey", shift("o_custkey", custStride, k))
    }, "orders", 16)
    write(replicate("lineitem", tpchFactor) { (d, k) =>
      d.withColumn("l_orderkey", shift("l_orderkey", ordStride, k))
        .withColumn("l_partkey", shift("l_partkey", partStride, k))
        .withColumn("l_suppkey", shift("l_suppkey", suppStride, k))
    }, "lineitem", 32)
    write(replicate("events", tpchFactor) { (d, k) =>
      d.withColumn("event_id", shift("event_id", evtStride, k))
        .withColumn("user_id", shift("user_id", userStride, k))
    }, "events", 16)

    write(replicate("documents", docFactor) { (d, k) =>
      // copy 0 is the UNTOUCHED source (cipherTo(0) is the identity, but
      // the source-suffix would not be — skip both so the contract
      // "copy 0 = pristine sf0.1" holds column-for-column)
      if (k == 0) d
      else d.withColumn("doc_id", shift("doc_id", docStride, k))
        .withColumn("source", concat(col("source"), lit(s"_c$k")))
        .withColumn("text", translate(col("text"), cipherFrom, cipherTo(k)))
    }, "documents", 32)
    write(replicate("embeddings", docFactor) { (d, k) =>
      val jittered =
        if (k == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x + lit(1e-3) * (pmod(xxhash64(col("vec_id") * lit(131) + i, lit(k)),
            lit(997L)).cast("double") / lit(997.0) - lit(0.5))).cast("float"))
      d.withColumn("vec_id", shift("vec_id", vecStride, k))
        .withColumn("label", col("label") + lit(k * 1000))
        .withColumn("embedding", jittered)
    }, "embeddings", 16)
  }
}
