package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-47 additions (llm_pass_at_k,
  * ts_trend_sensitivity).
  */
class Wave47Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("llm_pass_at_k: monotone in k, exact at the c=0/c=n poles") {
    val rows = q("llm_pass_at_k").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, p1, p5, p10) = (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(c <= n)
      Seq(p1, p5, p10).foreach(p => assert(p >= 0.0 && p <= 1.0))
      assert(p1 <= p5 + 1e-9 && p5 <= p10 + 1e-9,
        "pass@k must be non-decreasing in k")
      if (c == 0) assert(p1 == 0.0 && p10 == 0.0)
      if (c == n && n > 0) assert(p1 == 1.0)
      // pass@1 is the plain pass rate c/n
      if (n >= 1) assert(math.abs(p1 - c.toDouble / n) <= 1e-5,
        s"pass@1 must equal c/n: $p1 vs ${c.toDouble / n}")
    }
  }

  test("ts_trend_sensitivity: delta identity; trimmed fit is defined") {
    val r = q("ts_trend_sensitivity").collect().head
    val (all, trim, delta) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(!all.isNaN && !trim.isNaN)
    assert(math.abs(delta - (trim - all)) <= 2e-6)
  }
}
