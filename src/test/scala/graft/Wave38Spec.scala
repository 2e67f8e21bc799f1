package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-38 additions (stat_nelson_aalen,
  * stat_breslow_day).
  */
class Wave38Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_nelson_aalen: monotone hazard; NA survival >= KM survival") {
    val na = q("stat_nelson_aalen").collect()
    assert(na.nonEmpty)
    val hs = na.map(_.getDouble(3))
    assert(hs.zip(hs.tail).forall { case (a, b) => b >= a },
      "cumulative hazard must be non-decreasing")
    na.foreach(r => assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
    // exp(-sum d/n) >= prod(1 - d/n): Fleming-Harrington dominates KM
    // pointwise at every event time (same lifetimes, same risk sets)
    val km = q("ts_kaplan_meier").collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    na.foreach { r =>
      val t = r.getLong(0)
      km.get(t).foreach { kmS =>
        assert(r.getDouble(4) >= kmS - 1e-6,
          s"NA survival below KM at t=$t")
      }
    }
  }

  test("stat_breslow_day: positive common OR, Tarone <= BD chi2") {
    val r = q("stat_breslow_day").collect().head
    val (k, orMh, bd, tarone) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(k >= 2, "needs at least two strata")
    assert(orMh > 0.0)
    assert(bd >= 0.0)
    assert(tarone <= bd + 1e-9, "Tarone correction must not increase BD")
    assert(tarone >= -1e-6)
  }
}
