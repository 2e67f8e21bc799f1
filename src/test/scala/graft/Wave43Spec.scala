package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-43 additions (stream_join_catchup,
  * ts_ewma_volatility).
  */
class Wave43Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stream_join_catchup: streamed join equals the batch join") {
    val streamed = q("stream_join_catchup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
    val l = ev.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("ts").as("l_ts"),
        col("cents").as("l_cents"))
    val r = ev.filter(col("event_id") % 2 === 1)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("cents").as("r_cents"))
    val batch = l.join(r, col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 5 MINUTES"))
      .groupBy((col("user_id") % 10).as("b"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_cents") + col("r_cents")).cast("long").as("sc"))
      .orderBy("b").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(streamed.toSeq == batch.toSeq,
      "micro-batched stream-stream join must equal the batch join")
  }

  test("ts_ewma_volatility: positive, and tracks the return magnitude") {
    val rows = q("ts_ewma_volatility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vol = r.getDouble(2)
      assert(vol >= 0.0 && !vol.isNaN, s"bad vol: $vol")
    }
    // day 1 has exactly one return in the window: vol == |ret|
    val first = rows.head
    assert(math.abs(first.getDouble(2) - math.abs(first.getDouble(1)))
      <= 2e-6, "first-day vol must equal |first return|")
  }
}
