package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-16 additions, asserted on sf0.001. */
class Wave16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_mahalanobis: one row per flag, d2 positive, outliers bounded") {
    val rows = q("stat_mahalanobis").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "N", "R"))
    val nTotal = rows.map(_.getLong(1)).sum
    assert(nTotal == Tables.lineitem(spark, TestSpark.sf0001).count())
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0)
      assert(r.getLong(3) >= 0L && r.getLong(3) < r.getLong(1))
    }
  }

  test("stat_hill_tail: positive tail index from the top-501 order stats") {
    val r = q("stat_hill_tail").collect().head
    assert(r.getInt(0) == 500)
    assert(r.getDouble(1) > 0.0)
    // a finite-variance-ish synthetic price tail: alpha must be > 1
    // (mean exists) and not absurdly steep
    val alpha = r.getDouble(2)
    assert(alpha > 1.0 && alpha < 100.0)
  }

  test("stat_youden_threshold: rates in [0,1] and J = TPR - FPR") {
    val r = q("stat_youden_threshold").collect().head
    val (tpr, fpr, j) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(tpr >= 0.0 && tpr <= 1.0)
    assert(fpr >= 0.0 && fpr <= 1.0)
    assert(math.abs(j - (tpr - fpr)) < 2e-4) // rounding of each term
    // threshold must be one of the n_chars decade buckets
    assert(r.getLong(0) % 10 == 0)
  }

  test("stat_vif: every VIF >= 1 and correlations in [-1,1]") {
    val r = q("stat_vif").collect().head
    assert(r.getLong(0) == 6000L)
    Seq(1, 2, 3).foreach(i =>
      assert(math.abs(r.getDouble(i)) <= 1.0))
    Seq(4, 5, 6).foreach(i =>
      assert(r.getDouble(i) >= 1.0 - 1e-9, s"vif col $i < 1"))
  }

  test("stat_brown_forsythe: 3 groups, F >= 0") {
    val r = q("stat_brown_forsythe").collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 6000L)
    assert(r.getDouble(2) >= 0.0)
  }

  test("stat_hotelling_t2: T2 >= 0 and F scales by (n-3)/(2(n-2))") {
    val r = q("stat_hotelling_t2").collect().head
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val (t2, f) = (r.getDouble(2), r.getDouble(3))
    assert(na > 0 && nb > 0)
    assert(t2 >= 0.0)
    val expected = t2 * (na + nb - 3).toDouble / (2.0 * (na + nb - 2))
    assert(math.abs(f - expected) < 1e-3)
  }
}
