package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 20 (r16) — UNNEST WITH ORDINALITY
  * (reference: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java testUnnestWithOrdinality — non-collection
  * operands reject, an alias list must match the table degree INCLUDING
  * the ordinality column, and aliasing hides the original column
  * names). Dialect mapping: the engine's UNNEST WITH ORDINALITY surface
  * is the posexplode table-valued function (pos, col) — the same
  * two-column (value, ordinal) relation, so the reference's degree and
  * name-hiding semantics carry over verbatim. Same contract as
  * tranches 1-19. */
class ValidatorParitySpec17 extends AnyFunSuite {
  import SparkTestSession._

  private val rejects: Seq[(String, String)] = Seq(
    // "Cannot apply 'UNNEST' to arguments of type 'UNNEST(<INTEGER>)'"
    ("UNNEST of a non-collection operand",
      "select * from posexplode(1)"),
    // "List of column aliases must have same degree as table; table has
    // 2 columns ... whereas alias list has 1"
    ("alias list narrower than the ordinality relation",
      "select c from posexplode(array(1, 2)) as t(c)"),
    // "... whereas alias list has 3 columns"
    ("alias list wider than the ordinality relation",
      "select c from posexplode(array(1, 2)) as t(c, d, e)"),
    // "Column 'ORDINALITY' not found in any table" — aliasing hides the
    // original names (pos/col here, ordinality there)
    ("original ordinal name hidden behind the alias list",
      "select pos from posexplode(array(1, 2)) as t(c, d)"),
    ("original value name hidden behind the alias list",
      "select col from posexplode(array(1, 2)) as t(c, d)"))

  for ((name, sql) <- rejects)
    test(s"unnest-ordinality rejects: $name") {
      val ex = intercept[Exception] {
        spark.sql(sql).queryExecution.analyzed
      }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException],
        s"expected analysis/parse rejection, got ${ex.getClass}: ${ex.getMessage}")
    }

  test("unnest-ordinality controls: the accepted forms analyze cleanly") {
    Seq(
      // bare form exposes (pos, col) — the reference's (EXPR$0, ORDINALITY)
      "select * from posexplode(array(1, 2))",
      // alias list of exactly the table degree renames both columns
      "select c, d from posexplode(array(1, 2)) as t(c, d)",
      // the renamed ordinal is usable in WHERE (the reference's
      // `where ordinality < 5` row)
      "select d from posexplode(array(1, 2)) as t(c, d) where c < 5")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }
}
