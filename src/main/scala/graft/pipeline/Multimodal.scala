package graft.pipeline

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque binary payloads + typed metadata,
  * with a decode/feature-extract stage over partitions.
  *
  * The fixture set has no true image/audio tables, so the binary payload is
  * the document text re-encoded as bytes; the DECODE STEP IS A STUB — a
  * deterministic fake standing in for an image/audio codec (the real
  * libraries are not in this container). Everything around the stub is
  * real Spark plumbing: binary column + metadata schema, a mapPartitions
  * batch decode (the Scala analogue of mapInPandas — one iterator per
  * partition, amortizing codec setup per batch, the shape that matters at
  * 100 TB), and a fixed-width feature-vector output schema that downstream
  * similarity operators consume.
  */
object Multimodal {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    // nullable: the product encoder treats the array reference as nullable
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = true)))

  /** STUB decode: deterministic fake feature extraction from raw bytes
    * (byte histogram moments over 8 buckets). A real deployment swaps the
    * body for an image/audio decode; signature and batch shape stay. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >>> 5) += 1
      i += 1
    }
    hist.map(h => if (payload.length == 0) 0.0 else h.toDouble / payload.length)
  }

  final case class MediaFeatures(doc_id: Long, n_bytes: Int, features: Array[Double])

  /** Batch feature extraction over a binary column: one decode loop per
    * partition iterator (mapPartitions ≈ mapInPandas batches). Dataset
    * `mapPartitions` — NOT `.rdd` — so the decode stays a Catalyst
    * MapPartitions node: columnar input reaches the deserializer, AQE
    * still replans downstream, and the plan has no RDD scan barrier
    * (MultimodalPlanSpec asserts this). */
  def extractFeatures(docsWithPayload: DataFrame): DataFrame = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaFeatures(id, payload.length, decodeStub(payload))
      })
      .toDF()
  }

  val defs: Seq[QDef] = Seq(

    // ---- Binary payload + metadata (oracle-verified plumbing) -------------
    QDef.sql("multimodal_meta",
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  'text/plain' AS mime,
        |  ascii(text) AS head_byte,
        |  octet_length(CAST(text AS BLOB)) * 31 + n_chars AS checksum
        |FROM documents""") { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        lit("text/plain").as("mime"),
        ascii(col("text")).as("head_byte"),
        (octet_length(col("text").cast("binary")) * 31 + col("n_chars")).as("checksum"))
    },

    // ---- Frame sampling: stride slicing of a media payload ----------------
    // The video-frame-sample shape: one row per fixed-stride frame with
    // offset + head bytes. The payload stands in for a container stream;
    // a real codec swaps the head-extraction for a decode, the
    // generate-offsets → slice plumbing is the part that matters at scale
    // (explode is linear, no payload duplication per frame).
    QDef.sql("multimodal_frame_sample",
      """SELECT doc_id, f AS frame_idx,
        |  f * 128 + 1 AS off,
        |  substr(text, f * 128 + 1, 16) AS frame_head,
        |  len(substr(text, f * 128 + 1, 16)) AS head_len
        |FROM documents,
        |  LATERAL (SELECT unnest(generate_series(0, CAST((len(text) - 1) // 128 AS INT))) AS f) g
        |WHERE len(text) >= 1""") { (s, dir) =>
      t(s, dir, "documents").where(length(col("text")) >= 1)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0),
            floor((length(col("text")) - 1) / 128).cast("int"))).as("f"))
        .select(col("doc_id"), col("f").as("frame_idx"),
          (col("f") * 128 + 1).as("off"),
          substring(col("text"), col("f") * 128 + 1, lit(16)).as("frame_head"),
          length(substring(col("text"), col("f") * 128 + 1, lit(16))).as("head_len"))
    },

    // ---- Decode + feature extraction (stubbed codec, real plumbing) -------
    // The stub is a deterministic byte-histogram (bucket = byte >>> 5), so
    // the oracle can recompute it byte-exactly: hex() the payload, keep
    // the FIRST nibble of each byte via a backreference replace, and count
    // nibbles per bucket (bucket 0 = 0x00-0x1F → nibble 0/1; bucket 7 =
    // 0xE0-0xFF → nibble E/F). Counts convert exactly to double.
    QDef.sql("multimodal_decode_features",
      """WITH b AS (
        |  SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |    regexp_replace(hex(CAST(text AS BLOB)), '(.).', '\1', 'g') AS nib
        |  FROM documents
        |)
        |SELECT doc_id, n_bytes,
        |  CASE WHEN n_bytes = 0 THEN 0.0 ELSE
        |    CAST(len(nib) - len(regexp_replace(nib, '[01]', '', 'g')) AS DOUBLE) / n_bytes
        |  END AS f0,
        |  CASE WHEN n_bytes = 0 THEN 0.0 ELSE
        |    CAST(len(nib) - len(regexp_replace(nib, '[EF]', '', 'g')) AS DOUBLE) / n_bytes
        |  END AS f7
        |FROM b""") { (s, dir) =>
      val withPayload = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      extractFeatures(withPayload)
        .select(col("doc_id"), col("n_bytes"),
          element_at(col("features"), 1).as("f0"),
          element_at(col("features"), 8).as("f7"))
    },

    // ---- Audio-style OVERLAPPING windows + per-window energy --------------
    // The PCM windowing shape (window 64, stride 32, 50% overlap): each
    // window's samples are the payload's byte codes, energy = Σ code² and
    // RMS = sqrt(energy/n). All arithmetic is integer until one exact
    // division + one IEEE sqrt (correctly rounded on both engines), so
    // the result is bit-portable without rounding tricks. Scale shape:
    // explode is linear in (len/stride), windows slice the row-local
    // payload — no self-join, no payload duplication across rows.
    QDef.sql("multimodal_audio_windows",
      """WITH wins AS (
        |  SELECT doc_id, k, substr(text, k * 32 + 1, 64) AS wtext
        |  FROM documents,
        |    LATERAL (SELECT unnest(generate_series(0,
        |      CAST((len(text) - 64) // 32 AS INT))) AS k) g
        |  WHERE len(text) >= 64),
        |e AS (
        |  SELECT doc_id, k,
        |    CAST(list_sum(list_transform(string_split(wtext, ''),
        |      c -> CAST(ascii(c) AS BIGINT) * ascii(c))) AS BIGINT) AS energy
        |  FROM wins)
        |SELECT doc_id, k AS win_idx, energy,
        |  sqrt(CAST(energy AS DOUBLE) / 64) AS rms
        |FROM e""") { (s, dir) =>
      t(s, dir, "documents").where(length(col("text")) >= 64)
        .select(col("doc_id"),
          explode(sequence(lit(0),
            floor((length(col("text")) - 64) / 32).cast("int"))).as("k"),
          col("text"))
        .select(col("doc_id"), col("k").as("win_idx"),
          aggregate(
            transform(split(expr("substring(text, k * 32 + 1, 64)"), ""),
              c => ascii(c).cast("long") * ascii(c)),
            lit(0L), (acc, x) => acc + x).as("energy"))
        .withColumn("rms", sqrt(col("energy").cast("double") / 64))
    }
  )
}
