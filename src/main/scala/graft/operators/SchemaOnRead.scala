package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-on-read — the Drill fork's raison d'être: dynamic record types
  * whose fields materialize at query time
  * (reference: core/src/main/java/org/apache/calcite/rel/type/DynamicRecordType.java:24,
  * DynamicRecordTypeImpl.java:35 — unknown fields grow on demand via
  * RelDataTypeHolder.java:29; the `**` dynamic star, isDynamicStar at
  * RelDataTypeFieldImpl.java:106).
  *
  * Spark equivalent (SURVEY.md §1.3): resolve the schema at read time by
  * sampling the data, then bind it — `spark.read.json` inference +
  * `from_json` late binding play the roles of RelDataTypeHolder and the
  * validator's on-demand field creation. At 100 TB you infer on a bounded
  * sample (here: 100 rows), never the full corpus.
  */
object SchemaOnRead {

  /** Infer the struct schema of a JSON string column from a bounded sample. */
  def inferJsonSchema(df: DataFrame, jsonCol: String, sampleRows: Int = 100)
      : org.apache.spark.sql.types.StructType = {
    val spark = df.sparkSession
    val sample = df.select(col(jsonCol)).limit(sampleRows)
      .as(org.apache.spark.sql.Encoders.STRING)
    spark.read.json(sample).schema
  }

  val defs: Seq[QDef] = Seq(

    // Dynamic field access: the `k` field is not declared anywhere — it is
    // discovered from the data and then queried with a real type.
    QDef.sql("schema_on_read_dynamic",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k2
        |FROM events WHERE event_id % 11 = 0""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val schema = inferJsonSchema(ev, "props")
      ev.where(col("event_id") % 11 === 0)
        .select(col("event_id"), from_json(col("props"), schema).as("p"))
        .select(col("event_id"), col("p.k").as("k"), (col("p.k") * 2).as("k2"))
    },

    // Open-typed columns via Spark's native VARIANT — the binary-encoded
    // semi-structured type (parse once, typed access per query). This is
    // the closest modern Spark analogue of the fork's dynamic star: the
    // same cell can be read at different types per query site, missing
    // fields yield NULL (lax) or a raised error (strict, via variant_get
    // on a wrong type — spec-verified), and the per-row discovered schema
    // is first-class (schema_of_variant).
    QDef.sql("schema_on_read_variant",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_int,
        |  'OBJECT<k: BIGINT>' AS vschema
        |FROM events WHERE event_id % 11 = 0""") { (s, dir) =>
      Tables.t(s, dir, "events").where(col("event_id") % 11 === 0)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "bigint").as("k_int"),
          variant_get(col("v"), "$.k", "string").as("k_str"),
          try_variant_get(col("v"), "$.missing", "bigint").as("missing_int"),
          schema_of_variant(col("v")).as("vschema"))
    }
  )
}
