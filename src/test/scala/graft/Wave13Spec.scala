package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-13 additions, asserted on sf0.001. */
class Wave13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("llm_gopher_quality: every rule discriminates and counters are consistent") {
    val rows = q("llm_gopher_quality").collect()
    assert(rows.nonEmpty)
    def tot(i: Int) = rows.map(_.getLong(i)).sum
    val n = tot(1)
    // each rule fails SOMEONE somewhere but not everyone
    (2 to 5).foreach { i =>
      assert(tot(i) > 0, s"rule col $i never fires — threshold dead")
      assert(tot(i) < n, s"rule col $i fires on every doc")
    }
    rows.foreach { r =>
      assert(r.getLong(6) <= r.getLong(1), "keep <= docs")
      // keep + (at least the max single-rule failures) <= n_docs
      val maxFail = (2 to 5).map(r.getLong).max
      assert(r.getLong(6) + maxFail <= r.getLong(1))
    }
  }

  test("text_mattr: sttr <= 1, ttr falls with length while sttr is stable-bounded") {
    val rows = q("text_mattr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nSegs) = (r.getLong(1), r.getLong(2))
      assert(nSegs == nTok / 25 && nSegs >= 1)
      val (ttr, sttr) = (r.getDouble(3), r.getDouble(4))
      assert(ttr > 0 && ttr <= 1.0 && sttr > 0 && sttr <= 1.0)
      // subadditivity holds over the COVERED prefix only: distinct
      // types of the whole doc (incl. the dropped tail) can exceed
      // the segment-sum, so sttr >= ttr * covered_share is the tight
      // safe bound: distinct(full) <= sum_seg distinct + tail_len
      assert(sttr * (nSegs * 25) + (nTok - nSegs * 25) >=
        ttr * nTok - 0.1, "segment distinct sums cover full distinct")
    }
  }

  test("ts_hurst_rs: both sizes populated, H in a sane band") {
    val r = q("ts_hurst_rs").collect().head
    assert(r.getLong(1) >= 2 && r.getLong(2) >= 1, "segments exist")
    assert(r.getLong(1) >= r.getLong(2), "more 8-day than 16-day segments")
    val h = r.getDouble(5)
    assert(h > -0.5 && h < 1.5, s"hurst $h wildly out of band")
  }

  test("mm_aspect_bucket: all buckets used, waste bounded by construction") {
    val rows = q("mm_aspect_bucket").collect()
    assert(rows.length == 7, "every bucket attracts at least one image")
    val total = rows.map(_.getLong(3)).sum
    val docs = Tables.documents(spark, TestSpark.sf0001).count()
    assert(total == docs, "every image assigned exactly once")
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(5) < 1.0)
      assert(r.getDouble(4) <= r.getDouble(5))
    }
  }
}
