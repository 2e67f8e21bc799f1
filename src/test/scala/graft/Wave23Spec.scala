package graft

import org.apache.spark.sql.functions.{col, countDistinct, to_date}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-23 additions, asserted on sf0.001. */
class Wave23Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("export_txn_log_snapshot: log replay reconstructs the full table") {
    val rows = q("export_txn_log_snapshot").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("F", "O", "P"))
    // snapshot == source: compaction preserved the data, double-read
    // (stale P + compacted P2) or dropped-P replays would not sum up
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.orders(spark, TestSpark.sf0001).count())
  }

  test("ts_rolling_wau: windows cover every day, WAU >= DAU and <= total users") {
    val rows = q("ts_rolling_wau").collect()
    assert(rows.length == 30)
    val totalUsers = Tables.events(spark, TestSpark.sf0001)
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    val dau = Tables.events(spark, TestSpark.sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.foreach { r =>
      val wau = r.getLong(1)
      assert(wau <= totalUsers)
      assert(wau >= dau(r.getDate(0).toString))
    }
  }
}
