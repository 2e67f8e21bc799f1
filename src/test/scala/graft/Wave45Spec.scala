package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-45 additions
  * (graph_effective_diameter, ts_theta_forecast).
  */
class Wave45Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("graph_effective_diameter: p90 <= sampled-source eccentricity max") {
    val r = q("graph_effective_diameter").collect().head
    val (nPairs, meanD, effD) =
      (r.getLong(0), r.getDouble(1), r.getLong(2))
    assert(nPairs > 0)
    assert(meanD >= 1.0, "pairs exclude d=0, so the mean is >= 1")
    assert(effD >= 1)
    // the p90 can never exceed the max eccentricity of the same
    // 4-source sample
    val eccMax = q("graph_eccentricity").collect()
      .map(_.getLong(1)).max
    assert(effD <= eccMax,
      s"effective diameter $effD exceeds sampled eccentricity $eccMax")
  }

  test("ts_theta_forecast: trend consistency across the horizon") {
    val rows = q("ts_theta_forecast").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // SES level is horizon-independent (flat forecast)
    assert(rows.map(_._3).distinct.length == 1)
    // theta = midpoint of trend and SES at every h
    rows.foreach { case (_, ft, fs, th) =>
      assert(math.abs(th - (ft + fs) / 2.0) <= 1e-3,
        s"theta must average trend and SES: $ft $fs $th")
    }
    // trend forecast moves linearly: equal steps between horizons
    val steps = rows.map(_._2).sliding(2).map(p => p(1) - p(0)).toSeq
    assert(math.abs(steps(0) - steps(1)) <= 1e-3,
      s"trend extrapolation must be linear: $steps")
  }
}
