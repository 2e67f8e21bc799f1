package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-20 additions, asserted on sf0.001. */
class Wave20Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("text_textrank: 15 keywords, ranks positive and sorted desc") {
    val rows = q("text_textrank").collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      assert(r.getString(0).matches("[a-z]+"))
      assert(r.getLong(1) > 0L)
      assert(r.getDouble(2) > 0.0)
    }
    val ranks = rows.map(_.getDouble(2))
    ranks.sliding(2).foreach(p => assert(p(0) >= p(1)))
  }

  test("ts_seasonal_mann_kendall: 7 seasons, z sign tracks S, verdict at 1.96") {
    val r = q("ts_seasonal_mann_kendall").collect().head
    assert(r.getLong(0) == 7L)
    val (s, z) = (r.getLong(1), r.getDouble(3))
    if (s > 1) assert(z > 0.0)
    if (s < -1) assert(z < 0.0)
    assert(r.getBoolean(4) == (math.abs(z) > 1.96))
    assert(r.getDouble(2) > 0.0)
  }
}
