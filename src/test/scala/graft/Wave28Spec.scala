package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-28 additions, asserted on sf0.001. */
class Wave28Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_tukey_hsd: k(k-1)/2 pairs, flag matches critical value") {
    val rows = q("stat_tukey_hsd").collect()
    assert(rows.length == 3) // k = 3 returnflags -> 3 unordered pairs
    rows.foreach { r =>
      val (diff, qs, sig) = (r.getDouble(2), r.getDouble(3), r.getBoolean(4))
      assert(diff >= 0.0 && qs >= 0.0)
      assert(sig == (qs > 3.314),
        s"significance flag must equal q_stat > critical: $r")
    }
    // mean_diff recomputed straight from the fixture
    val means = Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy("l_returnflag").agg(avg("l_extendedprice").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val want = math.abs(means(r.getString(0)) - means(r.getString(1)))
      assert(math.abs(r.getDouble(2) - want) < 1e-2, s"mean_diff drift: $r")
    }
  }

  test("stat_g_test: df from marginals, G tracks Pearson chi2") {
    val r = q("stat_g_test").collect().head
    val (g, nCells, df) = (r.getDouble(0), r.getLong(1), r.getLong(2))
    assert(df == 2L)     // (3 flags - 1) * (2 statuses - 1)
    assert(nCells >= 4L && nCells <= 6L) // A/N and R/F only co-occur partially
    assert(g >= 0.0)
    // Asymptotic equivalence: on a contingency this size (n ~ 6k, no
    // near-empty cells) G and Pearson X2 agree to within a few percent.
    val cells = Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("o"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val n = cells.map(_._3).sum.toDouble
    val rowT = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colT = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val x2 = cells.map { case (f, st, o) =>
      val e = rowT(f) * colT(st) / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(g - x2) / math.max(x2, 1e-9) < 0.05,
      s"G=$g vs X2=$x2 diverge beyond the asymptotic band")
  }
}
