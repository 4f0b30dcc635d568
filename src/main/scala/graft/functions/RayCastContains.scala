package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** Native Catalyst expression: even-odd ray-casting point-in-polygon test.
  *
  * `RayCastContains(xs, ys, px, py)` — the polygon ring is given as
  * parallel coordinate arrays (closing edge implied), the test point as two
  * doubles. The classic crossing-parity scan is O(ring length) per row and
  * runs inside WholeStageCodegen — the Spark-first equivalent of the
  * reference's `ST_Contains` runtime
  * (reference: core/src/main/java/org/apache/calcite/runtime/GeoFunctions.java:307
  * ST_Contains; the reference delegates to ESRI geometry, we implement the
  * polygon/point case natively).
  *
  * Boundary points are not well-defined under crossing parity (matching the
  * usual even-odd convention); callers pick test data off the edges.
  */
case class RayCastContains(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "st_contains_ring expects (array<double>, array<double>, double, double)")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_contains_ring"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val px = c.asInstanceOf[Double]
    val py = d.asInstanceOf[Double]
    val n = math.min(xs.numElements(), ys.numElements())
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = xs.getDouble(i); val yi = ys.getDouble(i)
      val xj = xs.getDouble(j); val yj = ys.getDouble(j)
      if ((yi > py) != (yj > py) && px < (xj - xi) * (py - yi) / (yj - yi) + xi)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys, px, py) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val in = ctx.freshName("inside")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val xj = ctx.freshName("xj"); val yj = ctx.freshName("yj")
      s"""
         |int $n = java.lang.Math.min($xs.numElements(), $ys.numElements());
         |boolean $in = false;
         |for (int $i = 0, $j = $n - 1; $i < $n; $j = $i++) {
         |  double $xi = $xs.getDouble($i); double $yi = $ys.getDouble($i);
         |  double $xj = $xs.getDouble($j); double $yj = $ys.getDouble($j);
         |  if ((($yi > $py) != ($yj > $py)) &&
         |      ($px < ($xj - $xi) * ($py - $yi) / ($yj - $yi) + $xi)) {
         |    $in = !$in;
         |  }
         |}
         |${ev.value} = $in;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object RayCastContains {
  import org.apache.spark.sql.GraftBridge
  def st_contains_ring(xs: Column, ys: Column, px: Column, py: Column): Column =
    GraftBridge.column(RayCastContains(
      GraftBridge.expression(xs), GraftBridge.expression(ys),
      GraftBridge.expression(px), GraftBridge.expression(py)))
}
