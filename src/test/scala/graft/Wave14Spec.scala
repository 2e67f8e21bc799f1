package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-14 additions, asserted on sf0.001. */
class Wave14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("ts_croston: genuinely intermittent at sf0.001, rate between bounds") {
    val r = q("ts_croston").collect().head
    val (nDays, nDemand) = (r.getLong(0), r.getLong(1))
    assert(nDays == 30)
    assert(nDemand >= 2 && nDemand < nDays,
      s"series must be sparse for Croston to differ from SES ($nDemand/$nDays)")
    val (z, p, rate) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(z >= 1.0, "demand sizes are >= 1 by construction")
    assert(p >= 1.0, "inter-arrival gaps are >= 1 day")
    assert(math.abs(rate - z / p) < 1e-3)
  }

  test("stat_durbin_watson: DW in [0,4] and consistent with rho") {
    val r = q("stat_durbin_watson").collect().head
    assert(r.getLong(0) == 30)
    val (dw, rho) = (r.getDouble(1), r.getDouble(2))
    assert(dw > 0.0 && dw < 4.0)
    assert(math.abs(rho - (1.0 - dw / 2.0)) < 1e-3)
  }

  test("stat_cooks_distance: leverage sums to p=2, flags match threshold") {
    val rows = q("stat_cooks_distance").collect()
    assert(rows.length == 30)
    val hSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(hSum - 2.0) < 1e-3, s"sum of leverages $hSum != p")
    val thr = 4.0 / rows.length
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0)
      // rounded-value check with a guard band around the threshold
      val d = r.getDouble(4)
      if (d > thr + 1e-4) assert(r.getBoolean(5))
      if (d < thr - 1e-4) assert(!r.getBoolean(5))
    }
    // endpoints of a time regression carry the max leverage
    val maxH = rows.map(_.getDouble(3)).max
    assert(rows.head.getDouble(3) == maxH || rows.last.getDouble(3) == maxH)
  }
}
