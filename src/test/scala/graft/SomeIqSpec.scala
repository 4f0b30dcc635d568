package graft

import graft.iq.{Iq, IqSuite}

/** Exhaustive port of some.iq — quantified comparisons (`op ANY/SOME/ALL
  * (subquery | value-list)`) with SQL-standard three-valued semantics
  * (reference: core/src/test/resources/sql/some.iq; the reference plans
  * these via SubQueryRemoveRule's MIN/MAX + COUNT decomposition, visible
  * in the file's own !plan blocks).
  *
  * Spark has no quantified-comparison syntax, so [[quantify]] applies the
  * SAME decomposition the reference's optimizer uses, at the SQL level:
  *   x op ANY(S)  ->  CASE WHEN count(S)=0      THEN false
  *                         WHEN x op extremum(S) THEN true
  *                         WHEN x IS NULL OR S has nulls THEN null
  *                         ELSE false END
  * (extremum = MIN for >,>= / MAX for <,<=; the ALL form is the dual with
  * the negated operator and TRUE/FALSE swapped; `= ANY` is exactly IN;
  * value lists reduce to least/greatest — no NULL elements in the file).
  * Every branch of the decomposition is pinned by the goldens: empty
  * sub-query (trivially true/false even for NULL x), nullable right side
  * producing UNKNOWN rows (the scalar `as x` blocks), `IS UNKNOWN` over a
  * quantified predicate, and NOT-negation. All 28 blocks ported, zero
  * skips; the sub-queries in the file are uncorrelated by construction,
  * which is what makes the scalar-aggregate decomposition legal.
  */
class SomeIqSpec extends IqSuite {
  val iqFile = "some.iq"
  val expectedTotal = 28
  val rewrites: Map[Int, String => String] = Map()
  val skips: Map[Int, String] = Map()

  private val Quant =
    """(?is)(\w+)\s*(<=|>=|<|>|=)\s*(any|some|all)\s*\(\s*([^()]*?)\s*\)""".r
  private val SubQ = """(?is)select\s+(.*?)\s+from\s+(.*)""".r

  private def quantify(sql: String): String =
    Quant.replaceAllIn(sql, m => {
      val (x, op, quant, body) = (m.group(1), m.group(2),
        m.group(3).toLowerCase, m.group(4))
      val isAll = quant == "all"
      val repl = body match {
        case SubQ(e, rest) if op == "=" && !isAll =>
          s"$x in (select $e from $rest)"
        case SubQ(e, rest) =>
          val extremum =
            if ((op.startsWith(">")) == isAll) s"(select max($e) from $rest)"
            else s"(select min($e) from $rest)"
          val cnt = s"(select count(*) from $rest)"
          val cntNonNull = s"(select count($e) from $rest)"
          val nop = op match {
            case ">" => "<="; case ">=" => "<"; case "<" => ">="; case "<=" => ">"
          }
          if (isAll)
            s"""(case when $cnt = 0 then true
               |  when $x $nop $extremum then false
               |  when $x is null or $cntNonNull < $cnt then cast(null as boolean)
               |  else true end)""".stripMargin
          else
            s"""(case when $cnt = 0 then false
               |  when $x $op $extremum then true
               |  when $x is null or $cntNonNull < $cnt then cast(null as boolean)
               |  else false end)""".stripMargin
        case values => // literal value list, e.g. `> all (4000, 2000)`
          val fn = if ((op.startsWith(">")) == isAll) "greatest" else "least"
          s"$x $op $fn($values)"
      }
      scala.util.matching.Regex.quoteReplacement(repl)
    })

  override protected def runBlock(b: Iq.Block): Unit = {
    register(b.dataset)
    val sql = quantify(dialect(b.sql))
    val df = spark.sql(sql)
    Iq.assertMatches(s"$iqFile:${b.line}", df, b.expected)
  }

  generateTests()
}
