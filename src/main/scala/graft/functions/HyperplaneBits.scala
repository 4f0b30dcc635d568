package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: `bits`-bit random-hyperplane LSH bucket of
  * an ArrayType(DoubleType) vector, in one pass over the array.
  *
  * Hyperplane b (0-based) has integer pseudo-noise weights
  * `w(b, i) = (i*31 + b*17) % 7 - 3` over the 1-based dimension index i —
  * engine-independent integers, so any SQL engine recomputes the same
  * planes. Bit b of the bucket is set when the left-to-right IEEE double
  * fold of `v[i-1] * w(b, i)` is >= 0. The accumulation order matches both
  * the interpreted `aggregate(zip_with(...))` construction and DuckDB's
  * `list_reduce(list_transform(...), (x, y) -> x + y)` bit for bit
  * (0.0 + x == x for every IEEE double except the sign of -0.0, which the
  * >= 0 threshold cannot observe).
  *
  * Same extension path as [[DotProduct]]: the reference exposes
  * codegen-quality scalar functions through ImplementableFunction
  * (reference: core/src/main/java/org/apache/calcite/schema/ImplementableFunction.java,
  * registered in adapter/enumerable/RexImpTable.java:274); Spark's
  * equivalent is an Expression with doGenCode, keeping the LSH bucketing —
  * the per-row hot loop of similarity search at corpus scale — inside
  * WholeStageCodegen instead of 8 interpreted higher-order folds.
  */
case class HyperplaneBits(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 32, s"bits must be in [1, 32], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bits expects array<double>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val acc = new Array[Double](bits)
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var b = 0
      while (b < bits) {
        acc(b) += x * (((i + 1) * 31 + b * 17) % 7 - 3)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (acc(b) >= 0.0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double[] $acc = new double[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $acc[$b] += $x * ((($i + 1) * 31 + $b * 17) % 7 - 3);
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($acc[$b] >= 0.0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBits {
  import org.apache.spark.sql.GraftBridge
  /** Column-level API: `hyperplane_bits(v, bits)`. */
  def hyperplane_bits(v: Column, bits: Int = 8): Column =
    GraftBridge.column(HyperplaneBits(GraftBridge.expression(v), bits))
}
