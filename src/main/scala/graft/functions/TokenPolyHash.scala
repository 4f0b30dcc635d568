package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine-portable polynomial token hash
  * `h' = (h*31 + codepoint) mod 1000003`, folded from 0 over the string's
  * code points in one pass.
  *
  * Replaces the interpreted `aggregate(split(w, ""), ...)` chain of the
  * simhash signature, which allocates one single-character UTF8String per
  * code point and dispatches a lambda per fold step — the dominant constant
  * of the simhash query at any scale (it made `dedup_simhash` the only >2×
  * regression of round 5). The polynomial is exactly the one the DuckDB
  * oracle recomputes (`list_reduce(... (h, c) -> (h*31 + c) % 1000003)`),
  * so the signature stays hash-match verifiable; only the evaluation
  * strategy changes.
  *
  * Code points (not UTF-16 units) are folded so supplementary characters
  * hash as single units, matching `ascii()` over per-character splits in
  * both engines.
  *
  * Same extension path as [[ShingleHashes]] (reference:
  * core/src/main/java/org/apache/calcite/schema/ImplementableFunction.java —
  * functions contributing compiled kernels, registered in
  * adapter/enumerable/RexImpTable.java:274); generated code calls the
  * static kernel so the projection stays inside WholeStageCodegen.
  */
case class TokenPolyHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_poly_hash expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "token_poly_hash"

  override def nullSafeEval(a: Any): Any =
    TokenPolyHash.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenPolyHash.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenPolyHash {
  import org.apache.spark.sql.GraftBridge

  private final val Mod = 1000003L

  /** One pass over code points; h stays < 1000003 so h*31 + cp never
    * overflows a long. Called from interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val len = str.length
    var h = 0L
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column-level API: `token_poly_hash(word)`. */
  def token_poly_hash(word: Column): Column =
    GraftBridge.column(TokenPolyHash(GraftBridge.expression(word)))
}
