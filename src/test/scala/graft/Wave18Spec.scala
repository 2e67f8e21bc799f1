package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-18 additions, asserted on sf0.001. */
class Wave18Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("graph_closeness: WF closeness in (0,1], ball matches graph_harmonic") {
    val c = q("graph_closeness").collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      val cl = r.getDouble(3)
      assert(cl > 0.0 && cl <= 1.0)
      // sum of >=1 distances over the ball
      assert(r.getLong(2) >= r.getLong(1))
    }
    val harmonicBalls = q("graph_harmonic").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    c.foreach(r => assert(harmonicBalls(r.getLong(0)) == r.getLong(1)))
  }

  test("graph_cycle4: rectangles exist on the co-activity graph") {
    val r = q("graph_cycle4").collect().head
    assert(r.getLong(0) >= r.getLong(1)) // multi-codeg pairs are a subset
    assert(r.getLong(2) >= 2L)           // else no C4 could exist
    assert(r.getLong(3) > 0L)
  }

  test("join_spatial_knn: customers partition into matched+unmatched, d2 bounded") {
    val rows = q("join_spatial_knn").collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.customer(spark, TestSpark.sf0001).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      if (r.getLong(2) == 0) assert(r.isNullAt(3) && r.isNullAt(4))
      // 3x3 probe: Chebyshev <= 2*CELL-1 = 255 per axis
      else assert(r.getLong(4) <= 2L * 255 * 255)
    }
  }

  test("mm_pixel_histogram: per-lang shares sum to 1, ascii bins only") {
    val rows = q("mm_pixel_histogram").collect()
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) <= 7))
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    }
  }

  test("llm_prefix_cache: longer prefixes only split groups (rate non-increasing)") {
    val rows = q("llm_prefix_cache").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(10, 20, 40, 80))
    rows.foreach(r => assert(r.getLong(2) == 500L))
    val rates = rows.map(_.getDouble(4))
    rates.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-9))
    // the planted 60-char near-dup groups keep hits > 0 even at L=80
    assert(rows.last.getLong(3) > 0L)
  }
}
