package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-41 additions (stat_samplesize_cont,
  * stat_quantile_ci, llm_instruction_filter, mm_keyframe_select).
  */
class Wave41Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_samplesize_cont: n decreases as MDE grows, quadratically") {
    val rows = q("stat_samplesize_cont").collect()
      .map(r => r.getDouble(0) -> r.getLong(3)).toMap
    assert(rows.keySet == Set(0.01, 0.02, 0.05))
    assert(rows(0.01) > rows(0.02) && rows(0.02) > rows(0.05))
    // n ~ 1/mde^2: doubling MDE quarters n (ceil slack of a few units)
    val ratio = rows(0.01).toDouble / rows(0.02).toDouble
    assert(ratio > 3.9 && ratio < 4.1, s"expected ~4x, got $ratio")
  }

  test("stat_quantile_ci: lo <= median <= hi, all observed values") {
    val r = q("stat_quantile_ci").collect().head
    val (n, med, lo, hi) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0)
    assert(lo <= med && med <= hi, s"CI must bracket median: $lo $med $hi")
    val vals = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "purchase")
      .select(round(col("value").cast("decimal(18,2)"), 2).cast("double"))
      .collect().map(_.getDouble(0)).toSet
    assert(Seq(med, lo, hi).forall(vals.contains),
      "order statistics must be observed values, not interpolations")
  }

  test("llm_instruction_filter: accounting and score consistency") {
    val rows = q("llm_instruction_filter").collect()
    val nDocs = Tables.documents(spark, TestSpark.sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      // opener alone scores 2 => every opener doc is an instruction doc
      assert(r.getLong(2) >= r.getLong(3),
        "n_instruction must cover all opener docs")
    }
  }

  test("mm_keyframe_select: one keyframe per shot, consistent with shots") {
    val kf = q("mm_keyframe_select").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    kf.values.foreach { case (nShots, idxs) =>
      assert(idxs.split(",").length == nShots.toInt,
        "exactly one keyframe per shot")
    }
    // agrees with mm_shot_detect's shot counts per doc
    val sd = q("mm_shot_detect").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    kf.foreach { case (doc, (nShots, _)) =>
      assert(sd(doc) == nShots,
        s"shot count mismatch for doc $doc: $nShots vs ${sd(doc)}")
    }
  }
}
