package graft.iq

import org.apache.spark.sql.DataFrame

/** Minimal reader/runner for the reference's quidem `.iq` golden scripts
  * (reference: the .iq files under core/src/test/resources/sql — format
  * defined by the quidem tool the reference's QuidemTest drives). We parse the committed
  * files directly, so the expected outputs ARE the reference's own
  * goldens, line for line; the specs that use this harness assert our
  * engine reproduces them on the same fixture data.
  *
  * Parsed surface: `!use <dataset>`, `!ok` / `!error` / `!plan` / `!type`
  * result directives, `!if (prop) { ... !}` guards (blocks inside are
  * DISABLED — quidem skips them too, the guard props are unset in the
  * reference build), `!set` (ignored), `#` comments. A command is the
  * line-run ending in `;`; everything between the command and the next
  * directive is its expected output; a directive followed by more output
  * and another directive re-uses the same command (the `!ok` + `!plan`
  * pattern).
  */
object Iq {

  /** One directive's worth of golden: the command, its expected output,
    * which directive consumed it, and the `!use` dataset in force.
    * `line` is the 1-based line number of the directive in the source
    * file — the stable block id specs key skips/rewrites on. */
  case class Block(line: Int, dataset: String, sql: String,
      expected: Seq[String], directive: String, disabled: Boolean)

  def parse(path: String): Seq[Block] = {
    // explicit UTF-8: the JVM default charset is ASCII in this
    // environment and spatial.iq carries non-ASCII bytes
    val lines = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
      .getLines().toVector
    val blocks = Vector.newBuilder[Block]
    var dataset = ""
    var ifDepth = 0
    var currentSql = "" // last completed command (for output-only segments)
    var buf = Vector.empty[(Int, String)] // (lineNo, text) since last directive
    val Directive = """^!(\w+)\s*(.*)$""".r

    def flush(directive: String, atLine: Int): Unit = {
      // the segment since the last directive: if it contains a
      // `;`-terminated line, everything up to it (minus leading comments)
      // is a NEW command and the rest is output; otherwise the whole
      // segment is output for the PREVIOUS command
      val semi = buf.lastIndexWhere(_._2.trim.endsWith(";"))
      val (sqlPart, outPart) =
        if (semi >= 0) (buf.take(semi + 1), buf.drop(semi + 1)) else (Vector(), buf)
      if (semi >= 0) {
        // only the LAST statement is the command: a `;`-terminated
        // statement with no directive of its own (an authoring gap some
        // reference files contain — e.g. sub-query.iq's first "Composite
        // key" query) is never executed by quidem either
        val prevSemi = sqlPart.lastIndexWhere(_._2.trim.endsWith(";"), semi - 1)
        currentSql = sqlPart.drop(prevSemi + 1).map(_._2)
          .filterNot(_.startsWith("#"))
          .mkString("\n").trim.stripSuffix(";")
      }
      val expected = outPart.map(_._2)
        .dropWhile(_.trim.isEmpty).reverse.dropWhile(_.trim.isEmpty).reverse
      blocks += Block(atLine, dataset, currentSql, expected, directive, ifDepth > 0)
      buf = Vector.empty
    }

    for (((raw, i)) <- lines.zipWithIndex) {
      val n = i + 1
      raw.trim match {
        case Directive(cmd, arg) => cmd match {
          case "use" => dataset = arg.trim; buf = Vector.empty
          case "set" => buf = Vector.empty
          case "if" => ifDepth += 1
          case "}" => ifDepth -= 1 // unreachable: "!}"  doesn't match \w+
          case "ok" | "error" | "plan" | "type" | "update" => flush(cmd, n)
          case _ => buf = Vector.empty // unknown directive: drop segment
        }
        case "!}" => ifDepth -= 1; buf = Vector.empty
        case _ => buf :+= (n, raw)
      }
    }
    blocks.result()
  }

  /** Parse an expected table in any of quidem's three output formats —
    * mysql (`+---+` borders), psql (dashed underline), csv — into
    * (headers, rows-of-cells). Null cells are empty strings. Returns None
    * when the expected output is not a table (plan text, error message,
    * bare "(0 rows)"). */
  def parseTable(expected: Seq[String]): Option[(Seq[String], Seq[Seq[String]])] = {
    def cells(s: String): Seq[String] = {
      val t = s.trim.stripPrefix("|").stripSuffix("|")
      t.split("\\|", -1).toSeq.map(_.trim)
    }
    val borderIdx = expected.indexWhere(_.trim.startsWith("+-"))
    if (borderIdx >= 0 && borderIdx + 1 < expected.length) {
      // mysql: +---+ / | hdr | / +---+ / | rows | / +---+ / (n rows)
      val header = cells(expected(borderIdx + 1))
      val rows = expected.drop(borderIdx + 3)
        .takeWhile(l => l.trim.startsWith("|"))
        .map(cells)
      return Some((header, rows))
    }
    if (expected.length >= 2 &&
        expected(1).matches("""\s*-+( +-+)+\s*""")) {
      // oracle (`!set outputformat oracle`): space-separated dash runs
      // define fixed-width column spans; rows are space-padded slices,
      // terminated by a blank line + "N rows selected." (psql multi-col
      // underlines carry '+' separators, so they never take this branch)
      val dash = expected(1)
      val spans = """-+""".r.findAllMatchIn(dash).map(m => (m.start, m.end)).toSeq
      def slice(line: String): Seq[String] =
        spans.zipWithIndex.map { case ((a, b), i) =>
          val hi = if (i == spans.length - 1) line.length else math.min(b, line.length)
          if (a >= line.length) "" else line.substring(a, hi).trim
        }
      val header = slice(expected.head)
      val rows = expected.drop(2).takeWhile(_.trim.nonEmpty).map(slice)
      return Some((header, rows))
    }
    if (expected.length >= 2 && expected(1).trim.matches("-+[-+| ]*")) {
      // psql: hdr / ----- / rows / (n rows)
      val header = expected.head.split("\\|", -1).toSeq.map(_.trim)
      val rows = expected.drop(2)
        .takeWhile(l => !l.trim.matches("""\(\d+ rows?\)"""))
        .map(l => l.split("\\|", -1).toSeq.map(_.trim))
      return Some((header, rows))
    }
    if (expected.nonEmpty && !expected.head.startsWith("(") &&
        !expected.head.contains("Enumerable")) {
      // csv: hdr line, then one line per row (split on "," only when the
      // header is multi-column — single-column cells may embed commas)
      val header = expected.head.split(",").toSeq.map(_.trim)
      val rows = expected.tail
        .filterNot(l => l.trim.isEmpty || l.trim.matches("""\(\d+ rows?\)"""))
        .map(l => if (header.length == 1) Seq(l.trim)
                  else l.split(",", -1).toSeq.map(_.trim))
      if (rows.forall(_.length == header.length)) return Some((header, rows))
    }
    None
  }

  /** Canonical cell form so multiset comparison is format-insensitive:
    * numerics via BigDecimal with trailing zeros stripped (doubles first
    * rounded to 9 significant digits to absorb float noise), timestamps
    * without the trailing ".0", arrays (`[a, b]`) with sorted elements
    * (COLLECT order is engine-defined), everything else verbatim. */
  def canon(cell: String): String = {
    val s = cell.trim
    if (s.isEmpty) return ""
    // psql/csv formats spell NULL out; mysql prints an empty cell —
    // normalize to the empty spelling (struct canon maps it back inside
    // braces, where the goldens always write "null")
    if (s == "null") return ""
    // JSON cells (json_objectagg / json_arrayagg goldens): object key
    // order and array element order are ENGINE-defined (the reference
    // prints its HashMap iteration order) — canonicalize by sorting
    // object keys recursively and array elements by serialized form
    if (s.startsWith("{") || (s.startsWith("[") && s.contains("{"))) {
      try return canonJson(new com.fasterxml.jackson.databind.ObjectMapper().readTree(s))
      catch { case _: Exception => () }
    }
    if (s.startsWith("[") && s.endsWith("]")) {
      return s.drop(1).dropRight(1).split(",").map(_.trim).sorted
        .mkString("[", ", ", "]")
    }
    // ROW / struct cells print as {a, b} (order-significant) — canon each
    // element; Calcite spells nested nulls "null"
    if (s.startsWith("{") && s.endsWith("}") && !s.contains(":")) {
      return s.drop(1).dropRight(1).split(",", -1)
        .map(e => { val c = canon(e); if (c.isEmpty) "null" else c })
        .mkString("{", ", ", "}")
    }
    try {
      val bd = new java.math.BigDecimal(s)
      val rounded = bd.round(new java.math.MathContext(9))
      val plain = rounded.stripTrailingZeros.toPlainString
      return if (plain == "-0") "0" else plain
    } catch { case _: NumberFormatException => () }
    if (s.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.0""")) s.dropRight(2)
    else s
  }

  private def canonJson(n: com.fasterxml.jackson.databind.JsonNode): String = {
    import scala.jdk.CollectionConverters._
    if (n.isObject) {
      n.properties().asScala.toSeq.map(e => (e.getKey, canonJson(e.getValue)))
        .sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    } else if (n.isArray) {
      n.elements().asScala.toSeq.map(canonJson).sorted.mkString("[", ",", "]")
    } else n.toString
  }

  /** Render a Spark row value the way the goldens print it: top-level
    * nulls print empty (the mysql-format convention), NESTED nulls print
    * "null" (inside arrays/rows the goldens spell them out), ROW values
    * print in the goldens' brace form. */
  def render(v: Any): String = v match {
    case null => ""
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case s: collection.Seq[_] => s.map(nested).mkString("[", ", ", "]")
    case a: Array[_] => a.map(nested).mkString("[", ", ", "]")
    case r: org.apache.spark.sql.Row => r.toSeq.map(nested).mkString("{", ", ", "}")
    case other => other.toString
  }
  private def nested(v: Any): String = if (v == null) "null" else render(v)

  /** Compare a DataFrame against a block's expected table as a MULTISET
    * of canonicalized rows (the goldens' ORDER BY shapes stay covered on
    * values; we don't re-verify output order). Column names compare
    * case-insensitively; generated names (`EXPR$n`) are exempt.
    * Throws with a readable diff on mismatch. */
  def assertMatches(blockId: String, df: DataFrame, expected: Seq[String]): Unit = {
    val rowCountRe = """\((\d+) rows?\)""".r
    parseTable(expected) match {
      case None =>
        val want = expected.collectFirst { case rowCountRe(n) => n.toLong }
        want.foreach { n =>
          val got = df.count()
          assert(got == n, s"$blockId: expected $n rows, got $got")
        }
      case Some((header, rows)) =>
        val actualCols = df.columns.toSeq
        assert(actualCols.length == header.length,
          s"$blockId: expected columns $header, got $actualCols")
        for ((e, a) <- header.zip(actualCols)) {
          if (!e.matches("""EXPR\$\d+""") && !a.contains("("))
            assert(e.equalsIgnoreCase(a),
              s"$blockId: expected column '$e', got '$a' (all: $actualCols)")
        }
        // quidem truncates long cells to "<prefix>... (N characters)" --
        // match such cells by exact total length + exact raw prefix
        // (stronger than a skip, weaker than full equality only in the
        // unprinted tail). A got-cell satisfying a spec is replaced by
        // the golden's truncated spelling before the multiset compare.
        val TruncRe = """(?s)^(.*)\.\.\. \((\d+) characters\)$""".r
        // Specs are scoped PER COLUMN (two equal-length truncated cells
        // with a shared prefix in different columns cannot cross-match),
        // and within a column the longest matching prefix wins.
        val truncSpecs: Map[Int, Seq[(String, Int, String)]] = rows
          .flatMap(_.zipWithIndex)
          .collect { case (c @ TruncRe(prefix, n), i) => i -> ((prefix, n.toInt, c)) }
          .groupBy(_._1)
          .map { case (i, s) => i -> s.map(_._2).sortBy(-_._1.length) }
        def truncate(cell: String, colIdx: Int): String =
          truncSpecs.getOrElse(colIdx, Nil).collectFirst {
            case (prefix, n, spelled)
                if cell.length == n && cell.startsWith(prefix) => spelled
          }.getOrElse(cell)
        val want = rows.map(_.map(canon)).sortBy(_.mkString(""))
        val got = df.collect().toSeq
          .map(r => (0 until r.length).map(i => canon(truncate(render(r.get(i)), i))))
          .sortBy(_.mkString(""))
        if (want != got) {
          val missing = diff(want, got)
          val extra = diff(got, want)
          assert(false,
            s"""$blockId: result mismatch (${got.size} rows vs ${want.size} expected)
               |  missing: ${missing.take(5).map(_.mkString("|")).mkString("; ")}
               |  extra:   ${extra.take(5).map(_.mkString("|")).mkString("; ")}""".stripMargin)
        }
    }
  }

  private def diff(a: Seq[Seq[String]], b: Seq[Seq[String]]): Seq[Seq[String]] = {
    val counts = collection.mutable.Map.empty[Seq[String], Int].withDefaultValue(0)
    b.foreach(r => counts(r) += 1)
    a.filter { r => if (counts(r) > 0) { counts(r) -= 1; false } else true }
  }
}
