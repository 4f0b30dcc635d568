package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation, LogicalPlan}
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/** rebuildSpj join-order pin (r14 advice): leaves whose join graph
  * connects OUT of declaration order must still rebuild without a
  * condition-less (cartesian) Join — [A, B, C] with only A-C and B-C
  * conjuncts has to come back as (A⋈C)⋈B, never Join(A,B, cond=None).
  * Correctness was never at stake (the filter would re-apply on top);
  * the blowup at scale on range-union complement arms was. */
class RebuildSpjSpec extends AnyFunSuite {

  private def rel(n: String) =
    LocalRelation(Seq(AttributeReference(n, IntegerType)()))

  private def joins(p: LogicalPlan): Seq[Join] = p.collect { case j: Join => j }

  test("out-of-order join graph rebuilds with every Join conditioned") {
    val (a, b, c) = (rel("a"), rel("b"), rel("c"))
    val conjuncts = Seq(
      EqualTo(a.output.head, c.output.head),
      EqualTo(b.output.head, c.output.head))
    val plan = MaterializedViews.rebuildSpj(
      Seq(a, b, c), conjuncts, a.output ++ b.output ++ c.output)
    val js = joins(plan)
    assert(js.size == 2)
    assert(js.forall(_.condition.isDefined),
      s"cartesian Join in rebuilt plan:\n$plan")
    // B must be the LAST leaf attached (it only connects through C)
    assert(js.head.right.sameOutput(b), s"expected (A⋈C)⋈B, got:\n$plan")
  }

  test("fully disconnected leaves still rebuild (fallback to declaration order)") {
    val (a, b) = (rel("a"), rel("b"))
    val plan = MaterializedViews.rebuildSpj(Seq(a, b), Nil, a.output ++ b.output)
    assert(joins(plan).size == 1) // genuine cross join — nothing to connect on
  }

  test("connected-in-order graphs are unchanged by the reorder") {
    val (a, b, c) = (rel("a"), rel("b"), rel("c"))
    val conjuncts = Seq(
      EqualTo(a.output.head, b.output.head),
      EqualTo(b.output.head, c.output.head))
    val plan = MaterializedViews.rebuildSpj(
      Seq(a, b, c), conjuncts, a.output ++ b.output ++ c.output)
    val js = joins(plan)
    assert(js.size == 2 && js.forall(_.condition.isDefined))
    assert(js.head.right.sameOutput(c) || js.head.right.sameOutput(b))
  }
}
