package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench consumer keeps only the last ~2000 chars of stdout; the
  * stdout JSON line must always fit inside that window completely (plus
  * room for the build tool's trailing status lines). These are static
  * worst-case guarantees, no SparkSession needed.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("committed BENCH_FULL.json is the FULL registry bench (r13 VERDICT #2)") {
    val text = scala.io.Source.fromFile("BENCH_FULL.json", "UTF-8").mkString
    val n = """"n":(\d+)""".r.findFirstMatchIn(text).map(_.group(1).toInt)
      .getOrElse(fail("BENCH_FULL.json lost its \"n\" field"))
    assert(n == SparkEntry.allDefs.size,
      s"BENCH_FULL.json has n=$n but the registry has ${SparkEntry.allDefs.size} queries — " +
        "a partial/scale run writes SCALE_BENCH*.json; the full sf0.1 bench must be " +
        "regenerated whenever the registry changes (r13 shipped an n=1 scale run as the round bench)")
  }

  test("every headline name exists in the registry, exactly once") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size)
    val missing = Bench.headline.filterNot(names.contains)
    assert(missing.isEmpty, s"headline names not in registry: $missing")
    assert(Bench.headline.distinct.size == Bench.headline.size)
  }

  test("stdout line stays under 1800 chars at worst-case timings") {
    // Worst case: every registry query present, every headline timing at
    // four integer digits (9999.999 s — far beyond any plausible run),
    // rep evidence attached for the top-5 slowest (r14 VERDICT #6).
    val results = SparkEntry.allDefs.map(d => d.name -> Option(9999.999))
    val reps = SparkEntry.allDefs
      .map(d => d.name -> Seq(9999.999, 9999.999, 9999.999)).toMap
    val line = Bench.renderLine(9999.999, results, "/root/testdata/sf0.1", reps)
    assert(line.length < 1800, s"stdout bench line too long: ${line.length}")
    assert(line.startsWith("""{"metric":"total""""))
    assert(line.endsWith("""}"""))
    assert(line.contains(""""failed":[]"""))
    // the slowest block carries 5 entries, each with its raw reps
    assert(line.contains(""""slowest":{"""))
    assert("""\[9999\.999,9999\.999,9999\.999\]""".r
      .findAllIn(line).size == 5, s"expected 5 rep lists in: $line")
  }

  test("stdout line stays bounded when every query fails (capped failed list)") {
    val results: Seq[(String, Option[Double])] = SparkEntry.allDefs.map(d => d.name -> None)
    val line = Bench.renderLine(0.0, results, "/root/testdata/sf0.1")
    assert(line.length < 1800, s"stdout bench line too long: ${line.length}")
    assert(line.contains(""""failed":["""))
    assert(line.contains("more\""), "capped failed list should note the overflow count")
    // failed queries must surface as null, never a fabricated timing
    assert(line.contains(""""agg_tpch_q1":null"""))
    // full render carries the uncapped list
    val full = Bench.renderFull(0.0, results, "/root/testdata/sf0.1")
    assert(SparkEntry.allDefs.forall(d => full.contains("\"" + d.name + "\"")))
  }
}
