package graft

import graft.iq.IqSuite

/** Exhaustive port of match.iq — MATCH_RECOGNIZE over the HR schema
  * (reference: core/src/test/resources/sql/match.iq; 4 of the 9 blocks
  * are !if(false)-disabled in the reference itself). The goldens encode
  * the reference's ACTUAL EnumerableMatch behavior, already pinned by
  * GoldenSpec's match.iq DSL tests: it matches over INPUT order (the
  * clause's ORDER BY "empid" DESC is not applied), emits every matched
  * row even without ALL ROWS PER MATCH, resolves a bare-column measure
  * to the current row's value, RUNNING LAST(col) likewise, and
  * LAST(S.col) with FINAL semantics over the whole match.
  *
  * The rewrites express exactly that through the graft SQL front end
  * ([[graft.plans.MatchRecognizeSql]]): the `hr_mr` fixture carries an
  * explicit `pos` input-order column (and the constant `part` key the
  * restricted grammar requires), the clause runs ALL ROWS PER MATCH,
  * and an outer projection selects the golden's measure columns —
  * bare-column and RUNNING-LAST measures are the passed-through row
  * values, and FINAL LAST(S."empid") is `last(... IGNORE NULLS)` over
  * the match's window (MATCH_NUMBER partition), which is its
  * definition (SQL:2016 §R030). Block 42 additionally exercises the
  * harness's oracle output-format parser. */
class MatchIqSpec extends IqSuite {
  val iqFile = "match.iq"
  val expectedTotal = 9

  private val mrClause =
    """(SELECT * FROM hr_mr MATCH_RECOGNIZE (
      |  PARTITION BY part ORDER BY pos
      |  MEASURES MATCH_NUMBER() AS mno, CLASSIFIER() AS cl
      |  ALL ROWS PER MATCH
      |  AFTER MATCH SKIP PAST LAST ROW
      |  PATTERN (s up)
      |  DEFINE up AS commission < PREV(commission))) t""".stripMargin

  val rewrites: Map[Int, String => String] = Map(
    // measures "commission" as c, "empid": both are current-row values
    111 -> (_ => s"select commission as c, empid from $mrClause"),
    // + CLASSIFIER() as cl
    128 -> (_ => s"select commission as c, empid, cl from $mrClause"),
    // LAST("empid") is RUNNING in per-row output = current row's empid
    144 -> (_ => s"select commission as c, empid from $mrClause"),
    // LAST(S."empid") is FINAL: the last S-classified row of the match
    161 -> (_ => s"""select commission as c, cl,
      last(case when cl = 'S' then empid end, true) over (
        partition by mno order by pos
        rows between unbounded preceding and unbounded following) as empid
      from $mrClause""")
  )
  val skips: Map[Int, String] = Map()
  generateTests()
}
