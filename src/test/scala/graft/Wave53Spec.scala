package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-53 addition (scan_codec_roundtrip). */
class Wave53Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("scan_codec_roundtrip: identical aggregates under every codec") {
    val rows = SparkEntry.queries("scan_codec_roundtrip")(
      spark, TestSpark.sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("gzip", "snappy", "zstd"))
    assert(rows.map(r => (r.getLong(1), r.getDouble(2))).distinct
      .length == 1, "data must be codec-invariant")
    val n = Tables.supplier(spark, TestSpark.sf0001).count()
    rows.foreach(r => assert(r.getLong(1) == n))
  }
}
