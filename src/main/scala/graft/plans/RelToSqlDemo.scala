package graft.plans

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Registry wiring for the rel2sql converter: a DataFrame-built plan is
  * re-rendered as SQL text and EXECUTED from that text on both engines —
  * Spark re-parses the Spark-dialect rendering, the DuckDB oracle runs the
  * Ansi-dialect rendering — and the results must hash-match. This is the
  * end-to-end shape of the reference's JDBC adapter (reference:
  * adapter/jdbc/JdbcRules.java + rel/rel2sql/RelToSqlConverter.java:103):
  * plan in, dialect SQL out, foreign engine executes.
  *
  * RelToSqlSpec pins both renderings character-for-character, so the
  * oracle below can never drift from what the converter emits.
  */
object RelToSqlDemo {

  /** The demo plan: scan → filter → join → aggregate → project → sort,
    * built through the DataFrame API (never from SQL text). */
  def demoPlan(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables.t(s, dir, "customer")
    val nation = Tables.t(s, dir, "nation")
    customer.join(nation, customer("c_nationkey") === nation("n_nationkey"))
      .where(col("c_acctbal") > 100.0)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).as("sum_bal"))
      .select(col("n_name"), col("n_cust"),
        col("sum_bal").cast("double").as("avg_src"))
      .orderBy(col("n_name"))
  }

  /** Pinned Ansi rendering of [[demoPlan]] — the DuckDB oracle text.
    * RelToSqlSpec regenerates and compares; a converter change that alters
    * the rendering fails the spec before it can desync the oracle. */
  val pinnedAnsi: String = RelToSqlPinned.ansi

  val defs: Seq[QDef] = Seq(
    QDef.sql("rel2sql_roundtrip", RelToSqlPinned.ansi) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(RelToSql.convert(demoPlan(s, dir), RelToSql.Spark))
    },

    // PostgreSQL-dialect cycle: Spark executes the Spark rendering, the
    // DuckDB oracle executes the POSTGRES rendering verbatim (DuckDB's
    // Postgres-compatible subset covers it: double-quoted identifiers,
    // DOUBLE PRECISION, DECIMAL casts). Hash-match proves the Postgres
    // text computes the same relation — the JDBC-adapter shape against
    // the reference's most-hit real-world dialect
    // (sql/dialect/PostgresqlSqlDialect.java).
    QDef.sql("rel2sql_roundtrip_pg", RelToSqlPinned.postgres) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(RelToSql.convert(demoPlan(s, dir), RelToSql.Spark))
    }
  )
}
