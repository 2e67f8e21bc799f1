package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-19 additions, asserted on sf0.001. */
class Wave19Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_kde_density: full grid, non-negative, integrates to ~1") {
    val rows = q("stat_kde_density").collect()
    assert(rows.length == 21)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
    // Riemann sum density*step over the grid; boundary truncation and
    // grid coarseness allow a loose band
    val integral = rows.map(_.getDouble(2) / 1e6 * 25000.0).sum
    assert(integral > 0.85 && integral < 1.15, s"integral $integral")
  }

  test("agg_kmv_distinct: estimate matches the closed form, error sane at k=256") {
    val r = q("agg_kmv_distinct").collect().head
    assert(r.getLong(0) == 256L)
    val (hk, exact) = (r.getLong(1), r.getLong(2))
    val est = 255.0 * math.pow(2.0, 60) / hk
    assert(math.abs(r.getDouble(3) - est) < 1.0)
    // KMV with k=256: relative error well within 3/sqrt(k) ~ 19%
    assert(r.getDouble(4) > 0.8 && r.getDouble(4) < 1.25)
    assert(exact == 1500L)
  }

  test("ts_kalman_level: anchored at y1, levels contract toward observations") {
    val rows = q("ts_kalman_level").collect()
    assert(rows.length == 30)
    assert(rows.head.getDouble(2) == rows.head.getLong(1).toDouble)
    var prev = rows.head.getDouble(2)
    rows.tail.foreach { r =>
      val (y, l) = (r.getLong(1).toDouble, r.getDouble(2))
      // filtered level lies strictly between prior level and observation
      assert((l - prev) * (y - prev) >= 0.0)
      assert(math.abs(l - prev) <= math.abs(y - prev) + 1e-9)
      prev = l
    }
  }
}
