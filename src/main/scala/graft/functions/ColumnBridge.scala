package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge. Spark 4 moved `Column` to the
  * connect-agnostic sql-api; the classic runtime's adapter
  * (`org.apache.spark.sql.classic.ExpressionUtils`, columnNodeSupport
  * .scala) is `private[sql]` at the Scala level but its static forwarders
  * are public bytecode, so the bridge invokes them reflectively. Cost is
  * per ANALYSIS (function-registry builder invocation), never per row —
  * the returned Expression participates in codegen like any other.
  * Lets a Column-combinator pack (e.g. [[graft.operators.GeoSql]]) be
  * registered in the SQL FunctionRegistry. */
object ColumnBridge {
  private val cls = Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
  private val mCol = cls.getMethod("column",
    classOf[org.apache.spark.sql.catalyst.expressions.Expression])
  // the EAGER sql-api-node -> catalyst converter (the one classic
  // Dataset methods run at the API boundary). ExpressionUtils.expression
  // only WRAPS the node in an Unevaluable ColumnNodeExpression and
  // relies on that boundary — which never runs for an expression
  // produced inside function resolution, so convert eagerly here.
  private val convCls = Class.forName(
    "org.apache.spark.sql.classic.ColumnNodeToExpressionConverter$")
  private val converter = convCls.getField("MODULE$").get(null)
  private val mApply = convCls.getMethod("apply",
    Class.forName("org.apache.spark.sql.internal.ColumnNode"))
  private val mColNode = classOf[Column].getMethod("node")
  private val cneCls = Class.forName(
    "org.apache.spark.sql.classic.ColumnNodeExpression")
  private val mNode = cneCls.getMethod("node")
  private val ecnCls = Class.forName(
    "org.apache.spark.sql.classic.ExpressionColumnNode")
  private val mExpression = ecnCls.getMethod("expression")

  /** The converter leaves `ColumnNodeExpression(ExpressionColumnNode(e))`
    * leaf wrappers around expressions that entered via [[column]]; they
    * are Unevaluable and nothing strips them when the tree is produced
    * inside function resolution (the classic Dataset path has its own
    * rule). Unwrap them recursively. */
  private def unwrap(e: Expression): Expression = e.transformUp {
    case x if cneCls.isInstance(x) =>
      val node = mNode.invoke(x)
      if (ecnCls.isInstance(node))
        unwrap(mExpression.invoke(node).asInstanceOf[Expression])
      else x
  }

  def expr(c: Column): Expression =
    unwrap(mApply.invoke(converter, mColNode.invoke(c))
      .asInstanceOf[Expression])
  def column(e: Expression): Column =
    mCol.invoke(null, e).asInstanceOf[Column]

  /** Adapt a Column combinator to a FunctionRegistry builder. */
  def builder(f: Seq[Column] => Column): Seq[Expression] => Expression =
    exprs => expr(f(exprs.map(column)))
}
