package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-22 additions, asserted on sf0.001. */
class Wave22Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("ann_nndescent_round: refined >= seed everywhere, hop finds real wins") {
    val rows = q("ann_nndescent_round").collect()
    assert(rows.nonEmpty)
    var improved = 0
    rows.foreach { r =>
      val (sb, rb) = (r.getDouble(1), r.getDouble(2))
      assert(rb >= sb - 1e-4, s"refined $rb < seed $sb") // cands superset
      if (r.getBoolean(3)) improved += 1
    }
    // the multi-table neighbor-of-neighbor hop must beat the
    // single-table baseline for a substantial share of vectors —
    // the whole point of the round
    assert(improved.toDouble / rows.length > 0.3,
      s"only $improved/${rows.length} improved")
  }

  test("mm_shot_detect: one row per doc, shots bounded by frame count") {
    val rows = q("mm_shot_detect").collect()
    assert(rows.length ==
      Tables.documents(spark, TestSpark.sf0001).count().toInt)
    rows.foreach { r =>
      val (nf, shots) = (r.getLong(1), r.getLong(2))
      assert(shots >= 1 && shots <= nf)
      assert(r.getLong(3) >= 0)
      // single-frame docs cannot have boundaries
      if (nf == 1) assert(shots == 1 && r.getLong(3) == 0)
    }
  }
}
