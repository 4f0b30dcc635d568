package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact integer dot product of two ArrayType(LongType) columns.
  *
  * The quantized-cosine scoring path (pipeline/Similarity.scala,
  * `sim_quantized_cosine`) works over int8-quantized codes widened to
  * BIGINT; its dot product is pure integer arithmetic — exact and
  * order-independent, so the codegen loop is trivially bit-equal to the
  * interpreted `aggregate(zip_with(a, b, _*_), 0L, _+_)` fold AND to
  * DuckDB's `list_sum(list_transform(list_zip(a,b), p -> p[1]*p[2]))`.
  *
  * Same extension pattern as [[DotProduct]] (the reference's
  * ImplementableFunction / RexImpTable.java:274 codegen-contributing
  * scalar): an Expression with doGenCode so the hot loop lives inside
  * WholeStageCodegen instead of a CodegenFallback lambda dispatch — one
  * higher-order-function lambda anywhere in the operator kills codegen
  * for the whole stage (GeoCodegenBench, r12).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"long_dot expects (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  import org.apache.spark.sql.GraftBridge
  /** Column-level API: `long_dot(a, b)`. */
  def long_dot(a: Column, b: Column): Column =
    GraftBridge.column(
      LongDotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Squared L2 distance of two ArrayType(DoubleType) columns, accumulated
  * left-to-right: `acc += (x[i]-y[i])*(x[i]-y[i])` from 0.0.
  *
  * Bit-equal to the interpreted
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)` fold and
  * to DuckDB's `list_reduce(list_transform(list_zip(a,b),
  * p -> (p[1]-p[2])*(p[1]-p[2])), (x,y) -> x+y)` — the fold-from-zero and
  * fold-from-head orders coincide exactly because 0.0 + first == first in
  * IEEE. Used by the PQ-ADC candidate-distance stage
  * (pipeline/Similarity.scala, `sim_pq_adc_topk`) so the
  * corpus-subvector × codebook scoring join stays inside
  * WholeStageCodegen.
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"squared_l2 expects (array<double>, array<double>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "squared_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SquaredL2 {
  import org.apache.spark.sql.GraftBridge
  /** Column-level API: `squared_l2(a, b)`. */
  def squared_l2(a: Column, b: Column): Column =
    GraftBridge.column(
      SquaredL2(GraftBridge.expression(a), GraftBridge.expression(b)))
}
