package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Coalesce, Expression, If, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType}

/** Native UDAF: exact weighted average — Σ(w·x)/Σ(w) over DECIMAL
  * accumulators, evaluated as a `DeclarativeAggregate` so update/merge are
  * plain Catalyst expressions (codegen'd, partial-aggregation-capable —
  * Spark plans a map-side partial and a final merge like any built-in).
  *
  * This is the aggregate analogue of the reference's UDAF surface
  * (reference: core/src/main/java/org/apache/calcite/schema/impl/AggregateFunctionImpl.java —
  * init/add/merge/result over a value type; registered via model files /
  * SqlUserDefinedAggFunction sql/validate/SqlUserDefinedAggFunction.java:43).
  * The decimal accumulators keep the result order-independent and
  * bit-identical to the oracle's SUM(CAST(w*x AS DECIMAL))/SUM(CAST(w ...))
  * — the same determinism contract every oracle query follows.
  *
  * Null semantics: rows where x or w is null are skipped (SQL aggregate
  * convention); an all-null / empty group yields null.
  */
case class WeightedAvg(x: Expression, w: Expression)
    extends DeclarativeAggregate {

  // scale 4 keeps (integer digits + scale) < 15 for TPC-H-sized products,
  // so Spark's and DuckDB's double→decimal roundings agree bit-for-bit
  private val sumType = DecimalType(28, 4)

  override def children: Seq[Expression] = Seq(x, w)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "weighted_avg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (x.dataType == DoubleType && w.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"weighted_avg expects (double, double), got " +
        s"(${x.dataType.simpleString}, ${w.dataType.simpleString})")

  private lazy val sumWX = AttributeReference("sumWX", sumType)()
  private lazy val sumW = AttributeReference("sumW", sumType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sumWX, sumW)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, sumType), Literal.create(null, sumType))

  // additions re-cast to the buffer type: Add widens decimal precision by
  // one, and post-analysis expressions get no implicit coercion
  override lazy val updateExpressions: Seq[Expression] = {
    val skip = Or(IsNull(x), IsNull(w))
    val zero = Literal(java.math.BigDecimal.ZERO).cast(sumType)
    Seq(
      If(skip, sumWX,
        Cast(Coalesce(Seq(sumWX, zero)) + Cast(x * w, sumType), sumType)),
      If(skip, sumW,
        Cast(Coalesce(Seq(sumW, zero)) + Cast(w, sumType), sumType)))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Coalesce(Seq(Cast(sumWX.left + sumWX.right, sumType), sumWX.left, sumWX.right)),
    Coalesce(Seq(Cast(sumW.left + sumW.right, sumType), sumW.left, sumW.right)))

  override lazy val evaluateExpression: Expression =
    Cast(sumWX, DoubleType) / Cast(sumW, DoubleType)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), w = newChildren(1))
}

object WeightedAvg {
  import org.apache.spark.sql.GraftBridge
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}

  /** Column-level API: `weighted_avg(x, w)`. */
  def weighted_avg(x: Column, w: Column): Column =
    GraftBridge.column(AggregateExpression(
      WeightedAvg(GraftBridge.expression(x), GraftBridge.expression(w)),
      Complete, isDistinct = false))
}
