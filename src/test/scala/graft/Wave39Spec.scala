package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-39 additions (graph_katz,
  * ts_rolling_corr).
  */
class Wave39Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("graph_katz: positive, and ranks degree-1 below max-degree nodes") {
    val rows = q("graph_katz").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) > 0.0))
    val katzMax = rows.map(_.getDouble(1)).max
    val katzMin = rows.map(_.getDouble(1)).min
    assert(katzMax > katzMin, "katz must discriminate nodes")
  }

  test("ts_rolling_corr: values in [-1,1], full-window rows only") {
    val rows = q("ts_rolling_corr").collect()
    assert(rows.length == 17, s"30-day fixture, 14-day window -> 17 rows")
    rows.foreach { r =>
      val c = r.getDouble(1)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9,
        s"correlation out of range: $c")
    }
  }
}
