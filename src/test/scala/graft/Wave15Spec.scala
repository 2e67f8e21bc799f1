package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-15 additions, asserted on sf0.001. */
class Wave15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_breusch_pagan: R2_aux in [0,1], LM = n*R2, verdict at 3.8415") {
    val r = q("stat_breusch_pagan").collect().head
    val (n, r2, lm) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n == 30)
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(lm - n * r2) < 1e-2)
    assert(r.getBoolean(3) == (lm > 3.8415))
  }

  test("dq_volume_anomaly: one row per (type, day), z centered on the median") {
    val rows = q("dq_volume_anomaly").collect()
    val types = rows.map(_.getString(0)).distinct
    assert(types.length == 5 && rows.length == types.length * 30)
    types.foreach { t =>
      val sub = rows.filter(_.getString(0) == t)
      // the lower median day itself must sit at z = 0
      assert(sub.exists(r => !r.isNullAt(5) && r.getDouble(5) == 0.0),
        s"no zero-z day for $t")
      // flags only where |z| > 3.5
      sub.filter(_.getBoolean(6)).foreach(r =>
        assert(math.abs(r.getDouble(5)) > 3.5))
    }
  }

  test("mm_audio_rms: frame extremes bracket the overall RMS") {
    val rows = q("mm_audio_rms").collect()
    assert(rows.length == Tables.documents(spark, TestSpark.sf0001).count())
    rows.foreach { r =>
      val (n, nf) = (r.getLong(1), r.getLong(2))
      assert(nf == (n + 63) / 64)
      val (overall, mn, mx) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn <= overall + 1e-9 && overall <= mx + 1e-9,
        s"rms bracket violated: $mn <= $overall <= $mx")
      // ascii text bytes live in [32, 122]
      assert(mn >= 32.0 - 1e-9 && mx <= 122.0 + 1e-9)
    }
  }
}
