package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JSON introspection quartet — JSON_DEPTH / JSON_PRETTY / JSON_REMOVE /
  * JSON_STORAGE_SIZE (reference: core/src/main/java/org/apache/calcite/
  * sql/fun/SqlLibraryOperators.java, runtime JsonFunctions.java — the
  * MySQL-library members beyond TYPE/LENGTH/KEYS which `fn_json_info`
  * covers).
  *
  * A self-contained recursive-descent JSON reader (order-preserving,
  * escape-aware, raw scalar tokens kept verbatim) backs all four:
  *
  *  - DEPTH: scalars and empty containers are 1; a non-empty container is
  *    1 + max depth of its members (MySQL semantics).
  *  - PRETTY: MySQL-style 2-space indent, one member per line,
  *    `"key": value`.
  *  - REMOVE: drops the element at a `$.k`, `$.k.l`, `$.k[i]` path
  *    (single-path form; an absent path is a no-op, like MySQL).
  *  - STORAGE_SIZE: UTF-8 byte length of the CANONICAL compact
  *    serialization (`{"a": 1, "b": [2]}` — space after ':' and ','),
  *    the engine's stand-in for MySQL's binary-representation size; the
  *    measure is deterministic and whitespace-insensitive, which is the
  *    property the reference function exists for.
  *
  * Same compiled-kernel extension path as [[ShingleHashes]]
  * (RexImpTable.java:274).
  */
object JsonIntrospect {

  sealed private trait J
  private final case class JObj(fields: Vector[(String, J)]) extends J // key is raw inner text
  private final case class JArr(items: Vector[J]) extends J
  private final case class JLit(raw: String) extends J // number/bool/null/"string" verbatim

  private final class Parser(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"malformed JSON at offset $i: expected $what")
    def expect(c: Char): Unit = { if (i >= s.length || s.charAt(i) != c) fail(s"'$c'"); i += 1 }
    def rawString(): String = { // returns the text INSIDE the quotes, escapes kept
      expect('"')
      val start = i
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 1
        i += 1
      }
      val out = s.substring(start, i)
      expect('"')
      out
    }
    def value(): J = {
      ws()
      if (i >= s.length) fail("value")
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val fs = Vector.newBuilder[(String, J)]
          if (i < s.length && s.charAt(i) == '}') { i += 1; return JObj(Vector.empty) }
          var more = true
          while (more) {
            ws(); val k = rawString(); ws(); expect(':')
            fs += ((k, value())); ws()
            if (i < s.length && s.charAt(i) == ',') i += 1 else more = false
          }
          ws(); expect('}')
          JObj(fs.result())
        case '[' =>
          i += 1; ws()
          val it = Vector.newBuilder[J]
          if (i < s.length && s.charAt(i) == ']') { i += 1; return JArr(Vector.empty) }
          var more = true
          while (more) {
            it += value(); ws()
            if (i < s.length && s.charAt(i) == ',') i += 1 else more = false
          }
          ws(); expect(']')
          JArr(it.result())
        case '"' => JLit("\"" + rawString() + "\"")
        case _ =>
          val start = i
          while (i < s.length && "-+.eE0123456789truefalsn".indexOf(s.charAt(i)) >= 0) i += 1
          if (i == start) fail("scalar")
          JLit(s.substring(start, i))
      }
    }
    def document(): J = { val v = value(); ws(); if (i != s.length) fail("end of input"); v }
  }

  private def parse(s: String): J = new Parser(s).document()

  private def depthOf(j: J): Int = j match {
    case JObj(fs) => if (fs.isEmpty) 1 else 1 + fs.map(f => depthOf(f._2)).max
    case JArr(it) => if (it.isEmpty) 1 else 1 + it.map(depthOf).max
    case _ => 1
  }

  // NO separators after ':' / ',': the reference's Jackson-compact form —
  // SqlJsonFunctionsTest.testJsonRemove pins {"b":[2]} and
  // testJsonStorageSize counts 29 bytes for the spaceless rendering
  private def compact(j: J): String = j match {
    case JObj(fs) =>
      if (fs.isEmpty) "{}"
      else fs.map { case (k, v) => "\"" + k + "\":" + compact(v) }
        .mkString("{", ",", "}")
    case JArr(it) =>
      if (it.isEmpty) "[]" else it.map(compact).mkString("[", ",", "]")
    case JLit(raw) => raw
  }

  private def prettyOf(j: J, ind: Int): String = {
    val pad = "  " * (ind + 1)
    val close = "  " * ind
    j match {
      case JObj(fs) =>
        if (fs.isEmpty) "{}"
        else fs.map { case (k, v) => pad + "\"" + k + "\": " + prettyOf(v, ind + 1) }
          .mkString("{\n", ",\n", "\n" + close + "}")
      case JArr(it) =>
        if (it.isEmpty) "[]"
        else it.map(v => pad + prettyOf(v, ind + 1))
          .mkString("[\n", ",\n", "\n" + close + "]")
      case JLit(raw) => raw
    }
  }

  /** `$.a.b[2]` → Seq(Left("a"), Left("b"), Right(2)). */
  private def parsePath(p: String): Seq[Either[String, Int]] = {
    require(p.startsWith("$"), s"unsupported JSON path (must start with $$): '$p'")
    val seg = """\.([A-Za-z_][A-Za-z_0-9]*)|\[(\d+)\]""".r
    val segs = seg.findAllMatchIn(p.substring(1)).map { m =>
      if (m.group(1) != null) Left(m.group(1)) else Right(m.group(2).toInt)
    }.toSeq
    val consumed = seg.findAllMatchIn(p.substring(1)).map(_.matched).mkString
    require(consumed == p.substring(1), s"unsupported JSON path segment in '$p'")
    segs
  }

  private def removeAt(j: J, path: Seq[Either[String, Int]]): J = path match {
    case Seq() => j // '$' itself is not removable (MySQL errors; we no-op)
    case Seq(last) => (j, last) match {
      case (JObj(fs), Left(k)) => JObj(fs.filterNot(_._1 == k))
      case (JArr(it), Right(n)) =>
        if (n < it.length) JArr(it.patch(n, Nil, 1)) else JArr(it)
      case _ => j
    }
    case head +: rest => (j, head) match {
      case (JObj(fs), Left(k)) =>
        JObj(fs.map { case (kk, v) => if (kk == k) (kk, removeAt(v, rest)) else (kk, v) })
      case (JArr(it), Right(n)) =>
        if (n < it.length) JArr(it.updated(n, removeAt(it(n), rest))) else JArr(it)
      case _ => j
    }
  }

  // ---- static kernels (interpreted eval + generated code) ----------------

  def depth(s: UTF8String): Int = depthOf(parse(s.toString))
  def pretty(s: UTF8String): UTF8String =
    UTF8String.fromString(prettyOf(parse(s.toString), 0))
  def remove(s: UTF8String, path: UTF8String): UTF8String =
    UTF8String.fromString(compact(removeAt(parse(s.toString), parsePath(path.toString))))
  def storageSize(s: UTF8String): Int =
    compact(parse(s.toString)).getBytes("UTF-8").length

  // ---- column-level API ---------------------------------------------------

  import org.apache.spark.sql.GraftBridge

  def json_depth(j: Column): Column =
    GraftBridge.column(JsonDepth(GraftBridge.expression(j)))
  def json_pretty(j: Column): Column =
    GraftBridge.column(JsonPretty(GraftBridge.expression(j)))
  def json_remove(j: Column, path: Column): Column =
    GraftBridge.column(JsonRemove(GraftBridge.expression(j), GraftBridge.expression(path)))
  def json_storage_size(j: Column): Column =
    GraftBridge.column(JsonStorageSize(GraftBridge.expression(j)))
}

private[functions] trait JsonStringInput { self: Expression =>
  def checkJsonInput(dt: DataType, fn: String): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects a JSON string, got ${other.simpleString}")
  }
}

case class JsonDepth(child: Expression) extends UnaryExpression with JsonStringInput {
  override def checkInputDataTypes(): TypeCheckResult = checkJsonInput(child.dataType, prettyName)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "json_depth"
  override def nullSafeEval(a: Any): Any = JsonIntrospect.depth(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.JsonIntrospect.depth($a);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class JsonPretty(child: Expression) extends UnaryExpression with JsonStringInput {
  override def checkInputDataTypes(): TypeCheckResult = checkJsonInput(child.dataType, prettyName)
  override def dataType: DataType = StringType
  override def prettyName: String = "json_pretty"
  override def nullSafeEval(a: Any): Any = JsonIntrospect.pretty(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.JsonIntrospect.pretty($a);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class JsonStorageSize(child: Expression) extends UnaryExpression with JsonStringInput {
  override def checkInputDataTypes(): TypeCheckResult = checkJsonInput(child.dataType, prettyName)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "json_storage_size"
  override def nullSafeEval(a: Any): Any =
    JsonIntrospect.storageSize(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.JsonIntrospect.storageSize($a);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class JsonRemove(left: Expression, right: Expression)
    extends BinaryExpression with JsonStringInput {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "json_remove expects (json string, path string)")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "json_remove"
  override def nullSafeEval(a: Any, b: Any): Any =
    JsonIntrospect.remove(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JsonIntrospect.remove($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
