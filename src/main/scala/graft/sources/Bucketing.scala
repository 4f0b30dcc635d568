package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables — pre-partitioned, co-located storage so equi-joins and
  * aggregations on the bucket key need NO shuffle at read time.
  *
  * This is the Spark rendering of the physical-distribution machinery the
  * reference models logically as Exchange/RelDistribution
  * (reference: core/src/main/java/org/apache/calcite/rel/core/Exchange.java:55,
  * rel/RelDistribution.java — HASH_DISTRIBUTED): instead of re-hashing
  * 100 TB on every join, the distribution is established ONCE at write
  * time (`bucketBy` + `sortBy`), recorded in the catalog, and every
  * subsequent join or aggregation on the key reuses it. At cluster scale
  * this converts the dominant cost of a fact-fact join (two full
  * shuffles) into a local merge per bucket — the single most important
  * physical optimization for repeated joins on a canonical key.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their (shared) bucket key. With equal
    * bucket counts Spark plans a SortMergeJoin with NO Exchange on either
    * side — assert via `.explain`. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
