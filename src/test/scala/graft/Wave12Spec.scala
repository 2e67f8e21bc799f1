package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-12 additions (continuation session
  * of round 10) — properties the driver's hash compare can't see,
  * asserted on sf0.001.
  */
class Wave12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_moods_median: grand median in domain, chi2 = sum of terms, at-median rows drop") {
    val rows = q("stat_moods_median").collect()
    assert(rows.length == 3)
    val med = rows.head.getLong(1)
    assert(med >= 1 && med <= 50)
    assert(rows.forall(_.getLong(1) == med), "one shared grand median")
    val chi2 = rows.head.getDouble(6)
    assert(rows.forall(r => math.abs(r.getDouble(6) - chi2) < 1e-12))
    val termSum = rows.map(_.getDouble(5)).sum
    assert(math.abs(termSum - chi2) < 1e-3, s"terms $termSum vs chi2 $chi2")
    assert(rows.head.getLong(7) == 2L, "df = k - 1 = 2")
    val lineCount = Tables.lineitem(spark, TestSpark.sf0001).count()
    val tabled = rows.map(r => r.getLong(2) + r.getLong(3)).sum
    assert(tabled < lineCount, "rows at the median are excluded")
  }

  test("stat_icc: five priority groups, ICC(1) bounded, variance parts positive") {
    val r = q("stat_icc").collect().head
    assert(r.getLong(0) == 5L)
    val icc = r.getDouble(5)
    assert(icc >= -1.0 && icc <= 1.0)
    assert(r.getDouble(3) > 0 && r.getDouble(4) > 0, "MSB, MSW > 0")
    val n0 = r.getDouble(2)
    assert(n0 > 0 && n0 <= r.getLong(1).toDouble / 5.0 + 1e-9,
      "n0 <= balanced group size")
  }

  test("stat_deming: slope near the mean (1-d)(1+t) factor, strong correlation") {
    val rows = q("stat_deming").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val slope = r.getDouble(2)
      assert(slope > 0.95 && slope < 1.15,
        s"charge/price slope $slope should sit near (1-d)(1+t) ~ 1.03")
      val pr = r.getDouble(4)
      assert(pr > 0.95 && pr <= 1.0, s"pearson_r $pr")
    }
  }

  test("stat_tost_equivalence: bounds ordered and verdict consistent") {
    val r = q("stat_tost_equivalence").collect().head
    val (tl, tu) = (r.getDouble(3), r.getDouble(4))
    assert(tl > tu, "t_lower uses +delta, t_upper -delta")
    val verdict = r.getBoolean(6)
    assert(verdict == (tl > 1.6449 && tu < -1.6449))
    assert(math.abs(r.getDouble(2)) < 0.01, "A vs R discounts near-equal")
  }

  test("graph_reciprocity: ratio bounded, reciprocal count even") {
    val r = q("graph_reciprocity").collect().head
    val (e, rec) = (r.getLong(0), r.getLong(1))
    assert(rec >= 0 && rec <= e)
    assert(rec % 2 == 0, "reciprocal edges come in (u,v)/(v,u) pairs")
    val ratio = r.getDouble(2)
    assert(ratio >= 0.0 && ratio <= 1.0)
  }

  test("graph_degree_powerlaw: alpha > 1 over a non-empty tail") {
    val r = q("graph_degree_powerlaw").collect().head
    assert(r.getLong(1) > 0 && r.getLong(1) <= r.getLong(0))
    assert(r.getLong(2) >= 2, "max degree reaches the tail")
    assert(r.getDouble(3) > 1.0, "CSN alpha is > 1 by construction")
  }

  test("ts_spc_rules: flags consistent with reported z") {
    val rows = q("ts_spc_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getDouble(2)
      if (r.getBoolean(3)) assert(math.abs(z) > 2.999, "R1 implies |z|>3")
    }
    // R4 requires at least 8 days of history
    rows.sortBy(_.getString(0)).take(7).foreach(r => assert(!r.getBoolean(6)))
  }

  test("ts_sax_symbols: word length = full segments, alphabet respected") {
    val rows = q("ts_sax_symbols").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDays, nSegs, sax) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(nSegs == nDays / 4, "trailing partial segment dropped")
      assert(sax.length == nSegs)
      assert(sax.forall("abcd".contains(_)))
    }
  }
}
