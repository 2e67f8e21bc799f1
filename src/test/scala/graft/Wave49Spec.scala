package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-49 additions (ts_forecast_eval,
  * mm_silence_trim).
  */
class Wave49Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("ts_forecast_eval: two methods, consistent MASE scaling") {
    val rows = q("ts_forecast_eval").collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("snaive", "trend"))
    rows.values.foreach { case (mae, wape, mase) =>
      assert(mae >= 0.0 && wape >= 0.0 && mase >= 0.0)
    }
    // MASE ranks methods identically to MAE (same denominator)
    val byMae = rows.toSeq.sortBy(_._2._1).map(_._1)
    val byMase = rows.toSeq.sortBy(_._2._3).map(_._1)
    assert(byMae == byMase, "MASE must preserve the MAE ranking")
  }

  test("mm_silence_trim: frame accounting holds per lang") {
    val rows = q("mm_silence_trim").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, tot, trm, silent, share) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nDocs > 0 && tot > 0)
      assert(trm >= 0 && trm <= tot)
      assert(silent <= nDocs)
      assert(share >= 0.0 && share <= 1.0)
    }
  }
}
