package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-37 additions (stream_sliding_catchup,
  * stat_ancova, llm_ppl_ratio_select).
  */
class Wave37Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stream_sliding_catchup: every event lands in exactly 4 windows") {
    val rows = q("stream_sliding_catchup").collect()
    val nEvents = Tables.events(spark, TestSpark.sf0001).count()
    assert(rows.map(_.getLong(1)).sum == 4 * nEvents,
      "sliding overlap accounting broken")
    // all window starts are 15-minute-aligned
    rows.foreach { r =>
      val mmss = r.getString(0).takeRight(5)
      val mins = mmss.take(2).toInt
      assert(mins % 15 == 0 && mmss.endsWith(":00"),
        s"unaligned window start: ${r.getString(0)}")
    }
  }

  test("stat_ancova: per-flag rows share one model; F non-negative") {
    val rows = q("stat_ancova").collect()
    assert(rows.length == 3) // A, N, R
    val slopes = rows.map(_.getDouble(3)).distinct
    val fs = rows.map(_.getDouble(4)).distinct
    assert(slopes.length == 1 && fs.length == 1,
      "pooled slope / F must be identical on every group row")
    assert(fs.head >= 0.0)
    assert(rows.forall(r => !r.getDouble(2).isNaN))
  }

  test("llm_ppl_ratio_select: per-row rule accounting, doc totals") {
    val rows = q("llm_ppl_ratio_select").collect()
    val nDocs = Tables.documents(spark, TestSpark.sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val (n, sel, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(sel >= 0 && sel <= n)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // the target LM must find SOMETHING target-like in the corpus that
    // contains its own training slice
    assert(rows.map(_.getLong(2)).sum > 0, "nothing selected")
  }
}
