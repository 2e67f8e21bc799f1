package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-42 additions (stat_cvm_test,
  * ts_cpd_binseg2).
  */
class Wave42Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_cvm_test: non-negative and bounded by the KS statistic") {
    val r = q("stat_cvm_test").collect().head
    val (na, nb, t) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(t >= 0.0)
    // per-point (F1-F2)^2 <= D^2, so T <= n1*n2*D^2/(n1+n2)
    val ks = q("stat_ks_test").collect().head
    val d = ks.getDouble(3)
    val bound = na.toDouble * nb.toDouble * d * d / (na + nb).toDouble
    assert(t <= bound + 1e-6, s"CvM $t exceeds KS-derived bound $bound")
  }

  test("ts_cpd_binseg2: child split never costs more than its parent") {
    val rows = q("ts_cpd_binseg2").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows.contains("root"))
    val root = rows("root")
    assert(root >= 0.0)
    rows.filterKeys(_ != "root").foreach { case (seg, c) =>
      assert(c >= -1e-9, s"$seg SSE negative: $c")
      assert(c <= root + 1e-6,
        s"$seg split cost $c exceeds parent cost $root")
    }
  }
}
