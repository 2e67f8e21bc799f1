package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-44 additions (export_change_data_feed,
  * ts_seasonal_esd).
  */
class Wave44Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("export_change_data_feed: CDC accounting matches the merge") {
    val rows = q("export_change_data_feed").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // the merge scenario has no deletes -> no delete row at all
    assert(rows.keySet == Set("insert", "unchanged", "update"))
    assert(rows("insert") == ((25L, 1250.0)))
    val expUpd = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderstatus") === "P" && col("o_orderkey") % 3 === 0)
      .count()
    assert(rows("update")._1 == expUpd)
    assert(rows("update")._2 == 100.0 * expUpd)
    assert(rows("unchanged")._2 == 0.0)
    val total = Tables.orders(spark, TestSpark.sf0001).count()
    assert(rows("update")._1 + rows("unchanged")._1 == total)
  }

  test("ts_seasonal_esd: three rounds, flagged days distinct, z positive") {
    val rows = q("ts_seasonal_esd").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(r => r.getDate(1)).distinct.length == 3,
      "each round must flag a NEW day")
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
    // round 1 flags the globally largest deviation: its z must be the
    // max z computed against the FULL residual set, so z1 >= z2 is NOT
    // guaranteed (sd shrinks) - only distinctness and positivity are
  }
}
