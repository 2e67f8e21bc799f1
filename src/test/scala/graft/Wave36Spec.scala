package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-36 eval-metric / closed-form-fit
  * additions (llm_mrr_recall, llm_brier_decomposition, stat_pca_2d,
  * stat_weibull_fit).
  */
class Wave36Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("llm_mrr_recall: metric ranges; rank-1 doc is relevant when any is") {
    val rows = q("llm_mrr_recall").collect()
    assert(rows.length == 3) // one per query term
    rows.foreach { r =>
      val (nRel, mrr, rec5, map10) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(rec5 >= 0.0 && rec5 <= 1.0, s"recall5 out of range: $rec5")
      assert(map10 >= 0.0 && map10 <= 1.0, s"map10 out of range: $map10")
      // relevance = tf >= 3 and ranking = tf DESC, so if ANY doc is
      // relevant the rank-1 doc (max tf) must be -> MRR is exactly 1
      if (nRel > 0) assert(mrr == 1.0, s"rank-1 not relevant: mrr=$mrr")
      else assert(mrr == 0.0)
    }
  }

  test("llm_brier_decomposition: Murphy identity within binning error") {
    val r = q("llm_brier_decomposition").collect().head
    val (brier, rel, res, unc) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(brier >= 0.0 && brier <= 1.0)
    assert(rel >= 0.0)
    assert(res >= -1e-9, s"resolution negative: $res") // Koenig-Huygens
    assert(unc >= 0.0 && unc <= 0.25)
    // BS = REL - RES + UNC holds exactly for bin-constant forecasts;
    // the residual is the within-bin forecast variance, bounded by
    // (bin width)^2/4 = 0.0025
    val resid = math.abs(brier - (rel - res + unc))
    assert(resid <= 0.0035, s"Murphy identity residual too large: $resid")
  }

  test("stat_pca_2d: eigenvalues ordered and PSD, evr in [1/2, 1]") {
    val r = q("stat_pca_2d").collect().head
    val (l1, l2, evr, theta) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(l1 >= l2, "lambda1 < lambda2")
    assert(l2 >= 0.0, s"covariance not PSD: lambda2=$l2")
    assert(evr >= 0.5 && evr <= 1.0, s"evr1 out of range: $evr")
    assert(theta >= -math.Pi / 2 && theta <= math.Pi / 2)
  }

  test("stat_weibull_fit: positive shape/scale, grouped points < n") {
    val r = q("stat_weibull_fit").collect().head
    val (n, nPts, shape, scale) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0 && nPts > 0 && nPts <= n)
    assert(shape > 0.0, s"non-positive Weibull shape: $shape")
    assert(scale > 0.0, s"non-positive Weibull scale: $scale")
  }
}
