package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-30 additions, asserted on sf0.001. */
class Wave30Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("ts_event_study: purchase accounting and window exclusivity") {
    val r = q("ts_event_study").collect().head
    val nPurch = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(r.getLong(0) == nPurch)
    assert(r.getLong(1) <= r.getLong(0))
    // pooled click means are positive whenever any window had a click
    if (!r.isNullAt(2)) assert(r.getDouble(2) > 0.0)
    if (!r.isNullAt(3)) assert(r.getDouble(3) > 0.0)
  }

  test("stat_stratified_ate: matches brute force on the fixture") {
    val r = q("stat_stratified_ate").collect().head
    val rows = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(year(col("o_orderdate")).as("yr"),
        (col("o_orderpriority") === "1-URGENT").as("t"),
        col("o_totalprice"))
      .collect()
      .map(x => (x.getInt(0), x.getBoolean(1), x.getDouble(2)))
    val strata = rows.groupBy(_._1).filter { case (_, xs) =>
      xs.exists(_._2) && xs.exists(!_._2)
    }
    val nUsed = strata.values.map(_.length).sum
    assert(r.getLong(0) == strata.size && r.getLong(1) == nUsed)
    val want = strata.values.map { xs =>
      val t = xs.filter(_._2).map(_._3); val c = xs.filter(!_._2).map(_._3)
      (t.sum / t.length - c.sum / c.length) * xs.length
    }.sum / nUsed
    assert(math.abs(r.getDouble(3) - want) < 0.02,
      s"stratified ATE ${r.getDouble(3)} vs brute $want")
  }

  test("llm_speculative_accept: 16 positions, monotone prefix curve") {
    val rows = q("llm_speculative_accept").collect()
    assert(rows.length == 16)
    val nDocs = Tables.documents(spark, TestSpark.sf0001).count()
    rows.foreach { r =>
      assert(r.getLong(1) == nDocs)
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    val cum = rows.sortBy(_.getInt(0)).map(_.getDouble(3))
    cum.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, "prefix survival must be non-increasing")
    }
    // position 1: prefix survival equals the single-step acceptance
    val first = rows.minBy(_.getInt(0))
    assert(math.abs(first.getDouble(2) - first.getDouble(3)) < 1e-6)
  }
}
