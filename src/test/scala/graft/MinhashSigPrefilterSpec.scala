package graft

import graft.pipeline.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Pins the MinHash signature-estimate prefilter's contract
  * (pipeline/Dedup.minhashPairs `sigPrefilter`): the 64-byte-signature
  * cut is a pure optimization — on real fixture data the verified pair
  * set is IDENTICAL with and without it (the 4.1σ margin means a true
  * threshold pair slips only with p ≈ 2×10⁻⁵; the fixtures' near-dup
  * pairs sit well above the threshold, so any loss here is a bug, not
  * noise). Also pins the kernel: equal_byte_count over SQL. */
class MinhashSigPrefilterSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pairs(sigPrefilter: Boolean): Set[(Long, Long)] =
    Dedup.minhashPairs(Tables.t(spark, sfDir, "documents"), threshold = 0.6,
        sigPrefilter = sigPrefilter)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prefiltered pair set equals unfiltered pair set") {
    val unfiltered = pairs(sigPrefilter = false)
    val filtered = pairs(sigPrefilter = true)
    assert(unfiltered.nonEmpty, "fixture should contain near-dup pairs")
    assert(filtered == unfiltered,
      s"lost: ${unfiltered -- filtered}; gained: ${filtered -- unfiltered}")
  }

  test("equal_byte_count kernel counts positionwise equal bytes") {
    val r = spark.sql(
      """SELECT equal_byte_count(cast('abcd' as binary), cast('abzd' as binary)) AS c,
        |  equal_byte_count(cast('' as binary), cast('' as binary)) AS z,
        |  equal_byte_count(cast(null as binary), cast('x' as binary)) AS n"""
        .stripMargin).first()
    assert(r.getInt(0) == 3 && r.getInt(1) == 0 && r.isNullAt(2))
  }
}
