package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** Native Catalyst expression: polyline × polyline segment intersection.
  *
  * `SegmentsIntersect(xs1, ys1, xs2, ys2, proper)` — both polylines as
  * parallel coordinate arrays; O(n·m) orientation-test scan per row. With
  * `proper = false` it reports ANY intersection (including endpoint
  * touches and collinear contact); with `proper = true` only transversal
  * crossings (strict opposite orientations on both sides) — the pair
  * implements the line cases of ST_Intersects / ST_Crosses / ST_Touches
  * (reference: GeoFunctions.java ST_Intersects:375 / ST_Crosses:352 /
  * ST_Touches:401, which delegate to the ESRI kernel; we implement the
  * 1D×1D case natively). The scan runs inside WholeStageCodegen via a
  * static helper call — no boxing, no virtual dispatch.
  */
case class SegmentsIntersect(first: Expression, second: Expression,
    third: Expression, fourth: Expression, proper: Boolean)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "segments_intersect expects 4 × array<double>")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String =
    if (proper) "segments_cross_proper" else "segments_intersect"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    SegmentsIntersect.intersects(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData], proper)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs1, ys1, xs2, ys2) => {
      s"""
         |${ev.value} = graft.functions.SegmentsIntersect.intersects(
         |  $xs1, $ys1, $xs2, $ys2, $proper);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object SegmentsIntersect {
  import org.apache.spark.sql.GraftBridge

  def segments_intersect(xs1: Column, ys1: Column, xs2: Column, ys2: Column): Column =
    GraftBridge.column(SegmentsIntersect(
      GraftBridge.expression(xs1), GraftBridge.expression(ys1),
      GraftBridge.expression(xs2), GraftBridge.expression(ys2), proper = false))

  def segments_cross_proper(xs1: Column, ys1: Column, xs2: Column, ys2: Column): Column =
    GraftBridge.column(SegmentsIntersect(
      GraftBridge.expression(xs1), GraftBridge.expression(ys1),
      GraftBridge.expression(xs2), GraftBridge.expression(ys2), proper = true))

  /** Sign of the cross product (b-a) × (c-a): the orientation of c
    * relative to the directed segment a→b. */
  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Int = {
    val v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if (v > 0) 1 else if (v < 0) -1 else 0
  }

  /** Is c (collinear with a-b) within the a-b bounding box? */
  private def onSeg(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Boolean =
    math.min(ax, bx) <= cx && cx <= math.max(ax, bx) &&
      math.min(ay, by) <= cy && cy <= math.max(ay, by)

  private def segPair(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double, proper: Boolean): Boolean = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (o1 * o2 < 0 && o3 * o4 < 0) true
    else if (proper) false
    else (o1 == 0 && onSeg(ax, ay, bx, by, cx, cy)) ||
      (o2 == 0 && onSeg(ax, ay, bx, by, dx, dy)) ||
      (o3 == 0 && onSeg(cx, cy, dx, dy, ax, ay)) ||
      (o4 == 0 && onSeg(cx, cy, dx, dy, bx, by))
  }

  /** Any segment of polyline 1 vs any segment of polyline 2. Called from
    * generated code — keep the signature Java-friendly. */
  def intersects(xs1: ArrayData, ys1: ArrayData, xs2: ArrayData, ys2: ArrayData,
      proper: Boolean): Boolean = {
    val n1 = math.min(xs1.numElements(), ys1.numElements())
    val n2 = math.min(xs2.numElements(), ys2.numElements())
    var i = 0
    while (i < n1 - 1) {
      val ax = xs1.getDouble(i); val ay = ys1.getDouble(i)
      val bx = xs1.getDouble(i + 1); val by = ys1.getDouble(i + 1)
      var j = 0
      while (j < n2 - 1) {
        if (segPair(ax, ay, bx, by,
            xs2.getDouble(j), ys2.getDouble(j),
            xs2.getDouble(j + 1), ys2.getDouble(j + 1), proper)) return true
        j += 1
      }
      i += 1
    }
    false
  }
}
