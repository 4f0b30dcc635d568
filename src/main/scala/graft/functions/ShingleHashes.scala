package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the sorted, distinct 64-bit hashes of a
  * string's character n-grams, in one pass — the shingling front end of
  * the near-dup pipeline.
  *
  * Replaces the interpreted
  * `array_sort(array_distinct(transform(sequence(...), substr(...))))`
  * chain, which materializes one UTF8String per window position before
  * hashing (the dominant cost of the dedup queries at any scale: per
  * document it allocates ~|text| short strings just to throw them away).
  * Here each window packs its characters into a long (16 bits per char —
  * for n <= 4 the packing is injective) and runs a 64-bit finalizer that
  * is a BIJECTION on longs, so distinct n-grams map to distinct hashes
  * with zero collisions: set cardinalities and intersections over these
  * hashes equal those over the n-gram strings exactly, not just with
  * high probability.
  *
  * Windows count UTF-16 code units (Java chars); for BMP text — all the
  * fixtures — this equals codepoint windows, matching the oracle's
  * character-based substr. Supplementary characters would split into
  * surrogate pairs (a documented, deterministic deviation).
  *
  * Same extension path as [[DotProduct]] (reference:
  * core/src/main/java/org/apache/calcite/schema/ImplementableFunction.java —
  * functions contributing their own compiled kernels, registered in
  * adapter/enumerable/RexImpTable.java:274); the generated code calls the
  * static kernel so the surrounding projection stays in WholeStageCodegen.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1 && n <= 4, s"n-gram width must be in [1, 4], got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    ShingleHashes.compute(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.GraftBridge

  /** murmur3 fmix64 — invertible avalanche over the packed window. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** One pass: pack each n-char window, finalize, then sort + dedupe in
    * place. Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val wins = len - n + 1
    if (wins <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](wins)
    var i = 0
    while (i < wins) {
      var packed = 0L
      var j = 0
      while (j < n) { packed = (packed << 16) | str.charAt(i + j); j += 1 }
      out(i) = fmix64(packed)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 1
    var r = 1
    while (r < wins) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Column-level API: `shingle_hashes(text, n)`. */
  def shingle_hashes(text: Column, n: Int = 3): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), n))
}
