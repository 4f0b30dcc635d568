package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL:2011 period predicates — the reference's PERIOD operator set
  * (reference: sql/fun/SqlStdOperatorTable.java:1272-1285 CONTAINS /
  * PRECEDES / IMMEDIATELY_PRECEDES / SUCCEEDS / IMMEDIATELY_SUCCEEDS and
  * sql2rel/StandardConvertletTable.java:1016-1035, which lowers each onto
  * plain endpoint comparisons over CLOSED intervals).
  *
  * Spark-first: a period is a two-field struct column `(ps, pe)` and every
  * predicate composes the SAME endpoint comparisons the reference's
  * convertlet emits — plain codegen'd expressions Catalyst can push down
  * and constant-fold, exactly like the reference's plan for
  * `period(birthdate, DATE '1970-02-05') CONTAINS DATE '1964-01-01'`
  * (misc.iq:637-643 folds to one `<=` against the scan).
  */
object Periods {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  def period(start: Column, end: Column): Column =
    struct(start.as("ps"), end.as("pe"))

  private def ps(p: Column) = p.getField("ps")
  private def pe(p: Column) = p.getField("pe")

  /** p OVERLAPS q: e0 >= s1 AND e1 >= s0 (convertlet :1016-1019). */
  def overlapsP(p: Column, q: Column): Column = pe(p) >= ps(q) && pe(q) >= ps(p)

  /** p CONTAINS q: s0 <= s1 AND e0 >= e1 (:1020-1023). */
  def containsP(p: Column, q: Column): Column = ps(p) <= ps(q) && pe(p) >= pe(q)

  /** p CONTAINS t for a point: the degenerate period (t, t). */
  def containsPoint(p: Column, point: Column): Column =
    ps(p) <= point && pe(p) >= point

  /** p EQUALS q (:1024-1027). */
  def periodEquals(p: Column, q: Column): Column =
    ps(p) === ps(q) && pe(p) === pe(q)

  /** p PRECEDES q: e0 <= s1 (:1028-1029). */
  def precedesP(p: Column, q: Column): Column = pe(p) <= ps(q)

  /** p IMMEDIATELY PRECEDES q: e0 = s1 (:1030-1031). */
  def immediatelyPrecedesP(p: Column, q: Column): Column = pe(p) === ps(q)

  /** p SUCCEEDS q: s0 >= e1 (:1032-1033). */
  def succeedsP(p: Column, q: Column): Column = ps(p) >= pe(q)

  /** p IMMEDIATELY SUCCEEDS q: s0 = e1 (:1034-1035). */
  def immediatelySucceedsP(p: Column, q: Column): Column = ps(p) === pe(q)

  val defs: Seq[QDef] = Seq(
    // Every period predicate over each order's 30-day fulfillment window
    // vs a fixed query window / point — the oracle lowers to the same
    // endpoint comparisons the reference's convertlet emits.
    QDef.sql("temporal_periods",
      """SELECT o_orderkey,
        |  (o_orderdate <= TIMESTAMP '1996-07-01 00:00:00'
        |   AND o_orderdate + INTERVAL 30 DAY >= TIMESTAMP '1996-07-01 00:00:00')
        |    AS contains_pt,
        |  (o_orderdate + INTERVAL 30 DAY >= TIMESTAMP '1996-06-01 00:00:00'
        |   AND TIMESTAMP '1996-08-01 00:00:00' >= o_orderdate) AS overlaps_q,
        |  (o_orderdate + INTERVAL 30 DAY <= TIMESTAMP '1996-06-01 00:00:00')
        |    AS precedes_q,
        |  (o_orderdate >= TIMESTAMP '1996-08-01 00:00:00') AS succeeds_q,
        |  (o_orderdate + INTERVAL 30 DAY = TIMESTAMP '1996-06-01 00:00:00')
        |    AS imm_precedes_q,
        |  (o_orderdate = TIMESTAMP '1996-06-01 00:00:00'
        |   AND o_orderdate + INTERVAL 30 DAY = TIMESTAMP '1996-08-01 00:00:00')
        |    AS equals_q
        |FROM orders WHERE o_orderkey % 7 = 0""") { (s, dir) =>
      val p = period(col("o_orderdate"),
        col("o_orderdate") + expr("INTERVAL 30 DAY"))
      val q = period(lit("1996-06-01 00:00:00").cast("timestamp"),
        lit("1996-08-01 00:00:00").cast("timestamp"))
      t(s, dir, "orders").where(col("o_orderkey") % 7 === 0).select(
        col("o_orderkey"),
        containsPoint(p, lit("1996-07-01 00:00:00").cast("timestamp")).as("contains_pt"),
        overlapsP(p, q).as("overlaps_q"),
        precedesP(p, q).as("precedes_q"),
        succeedsP(p, q).as("succeeds_q"),
        immediatelyPrecedesP(p, q).as("imm_precedes_q"),
        periodEquals(p, q).as("equals_q"))
    }
  )
}
