package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-48 addition (stream_tws_catchup). */
class Wave48Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stream_tws_catchup: recovered TWS state equals batch aggregate") {
    val streamed = SparkEntry.queries("stream_tws_catchup")(
      spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .cast("double") / 100.0).as("tv"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSeq == batch.toSeq,
      "per-key final TransformWithState state must equal the batch " +
        "group-by, independent of micro-batch splits")
  }
}
