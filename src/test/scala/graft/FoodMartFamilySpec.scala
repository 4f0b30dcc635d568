package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins COVERAGE.md's FoodMart MDX construct-family census to the
  * registry (r13 verdict #6): every `foodmart_*` name a family row cites
  * must exist in SparkEntry.queries, and every registered foodmart query
  * must appear in some family row — so the family map can neither rot
  * nor silently omit a shape. */
class FoodMartFamilySpec extends AnyFunSuite {

  test("every census-cited foodmart query exists, and every foodmart query is cited") {
    val src = scala.io.Source.fromFile("COVERAGE.md", "UTF-8")
    val text = try src.mkString finally src.close()
    val start = text.indexOf("### FoodMart MDX construct-family census")
    assert(start >= 0, "family census section missing from COVERAGE.md")
    val end = text.indexOf("## §5", start)
    val section = text.substring(start, end)
    val cited = """foodmart_\w+""".r.findAllIn(section).toSet
    val registered = SparkEntry.queries.keySet.filter(_.startsWith("foodmart_"))
    val phantom = cited -- registered
    val uncited = registered -- cited
    assert(phantom.isEmpty, s"census cites non-existent queries: $phantom")
    assert(uncited.isEmpty, s"registered foodmart queries missing from the census: $uncited")
    info(s"family census: ${cited.size} shapes across the construct families")
  }
}
