package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANSI error semantics — the reference's checked arithmetic and cast
  * failures (reference: core/src/main/java/org/apache/calcite/runtime/
  * SqlFunctions.java — overflow-checked ops; CalciteException on bad
  * casts) map to Spark's ANSI mode (default-on in Spark 4) plus the
  * `try_*` escape hatches. */
class AnsiSpec extends AnyFunSuite {
  import SparkTestSession._

  private def one(sql: String) = spark.sql(sql).head()

  test("ANSI mode is on: overflow and bad casts raise, like the reference") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    intercept[Exception] {
      one("SELECT CAST(9223372036854775807 AS BIGINT) + 1")
    }
    intercept[Exception] { one("SELECT CAST('not a number' AS INT)") }
    intercept[Exception] { one("SELECT 1 div 0") }
  }

  test("try_* forms return NULL instead of raising") {
    assert(one("SELECT try_add(9223372036854775807, 1)").isNullAt(0))
    assert(one("SELECT try_cast('not a number' AS INT)").isNullAt(0))
    assert(one("SELECT try_divide(1, 0)").isNullAt(0))
    assert(one("SELECT try_add(1, 2)").getInt(0) == 3)
  }

  test("division by zero raises under ANSI even for doubles; NaN passes through") {
    intercept[Exception] { one("SELECT 1.0e0 / 0.0e0") }
    assert(one("SELECT try_divide(1.0e0, 0.0e0)").isNullAt(0))
    // non-finite VALUES still flow (only the operator is checked)
    assert(one("SELECT isnan(CAST('NaN' AS DOUBLE))").getBoolean(0))
  }
}
