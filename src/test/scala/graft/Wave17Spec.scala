package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-17 additions, asserted on sf0.001. */
class Wave17Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("ts_adf_test: n = days-1, verdict consistent with the t-stat") {
    val r = q("ts_adf_test").collect().head
    assert(r.getLong(0) == 29L) // 30 fixture days, one lost to the lag
    val t = r.getDouble(2)
    assert(r.getBoolean(3) == (t < -2.86))
    // daily counts around a constant mean: gamma must be negative
    // (mean reversion), never explosive (> 0)
    assert(r.getDouble(1) < 0.0)
  }

  test("ts_yule_walker_ar2: |r|<=1, stationarity triangle holds") {
    val r = q("ts_yule_walker_ar2").collect().head
    val (r1, r2) = (r.getDouble(1), r.getDouble(2))
    assert(math.abs(r1) <= 1.0 && math.abs(r2) <= 1.0)
    val (p1, p2) = (r.getDouble(3), r.getDouble(4))
    // AR(2) stationarity triangle: |φ2|<1, φ2±φ1<1
    assert(math.abs(p2) < 1.0 && p2 + p1 < 1.0 && p2 - p1 < 1.0)
    assert(r.getDouble(5) > 0.0) // count forecast stays positive
  }

  test("ts_newey_west: lrv positive, inflation = lrv/gamma0") {
    val r = q("ts_newey_west").collect().head
    val (g0, lrv, infl) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(g0 > 0.0 && lrv > 0.0)
    assert(math.abs(infl - lrv / g0) < 1e-2)
  }

  test("ts_turning_points: count within [0, n-2], z centered on 2(n-2)/3") {
    val r = q("ts_turning_points").collect().head
    val (n, t) = (r.getLong(0), r.getLong(1))
    assert(t >= 0 && t <= n - 2)
    assert(math.abs(r.getDouble(2) - 2.0 * (n - 2) / 3.0) < 1e-3)
  }

  test("ts_haar_energy: 4 levels with 8/4/2/1 coefficients, parseval sane") {
    val rows = q("ts_haar_energy").collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 8L), (2, 4L), (3, 2L), (4, 1L)))
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
    // total detail energy must not exceed total series energy
    val detail = rows.map(_.getDouble(2)).sum
    val counts = Tables.events(spark, TestSpark.sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")))
      .count().orderBy("to_date(ts)").collect().take(16).map(_.getLong(1))
    val total = counts.map(c => c.toDouble * c).sum
    assert(detail <= total)
  }
}
