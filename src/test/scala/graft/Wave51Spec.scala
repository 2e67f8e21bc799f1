package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-51 addition (graph_conductance). */
class Wave51Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graph_conductance: cut/volume accounting over the LPA partition") {
    val rows = SparkEntry.queries("graph_conductance")(
      spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    val totalVol = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val (n, vol, cut) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1)
      assert(cut <= vol, "cut edges are a subset of the volume")
      if (!r.isNullAt(4)) {
        val phi = r.getDouble(4)
        assert(phi >= 0.0, s"negative conductance: $phi")
        // phi = cut/min(vol, M-vol) and cut <= vol, but the divisor
        // may be the SMALLER complement side, so only >= 0 is general
        assert(vol < totalVol, "non-lone community expected when phi defined")
      }
    }
    // community sizes must match graph_label_propagation's partition
    val lp = SparkEntry.queries("graph_label_propagation")(
      spark, TestSpark.sf0001).collect()
      .groupBy(_.getLong(1)).map { case (k, v) => k -> v.length.toLong }
    val here = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(here == lp, "conductance must report the same LPA communities")
  }
}
