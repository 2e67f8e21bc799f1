package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-26 additions, asserted on sf0.001. */
class Wave26Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("ts_circular_hour: mean hour on the clock, R in [0,1], z = nR^2") {
    val r = q("ts_circular_hour").collect().head
    val (n, mh, rr, z) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(mh >= 0.0 && mh < 24.0)
    assert(rr >= 0.0 && rr <= 1.0)
    assert(math.abs(z - n * rr * rr) < 0.01)
    // uniform synthetic arrivals: no strong concentration expected
    assert(rr < 0.5)
  }

  test("stream_enrich_catchup: exactly-once sink equals the batch join") {
    val rows = q("stream_enrich_catchup").collect()
    // one row per nation key actually hit (sf0.001 has 15 users)
    val hitKeys = Tables.events(spark, TestSpark.sf0001)
      .select((org.apache.spark.sql.functions.col("user_id") % 25))
      .distinct().count()
    assert(rows.length == hitKeys)
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.events(spark, TestSpark.sf0001).count())
    // second invocation replays nothing and returns the same totals
    val again = q("stream_enrich_catchup").collect()
    assert(again.map(_.getLong(1)).sum == total)
  }
}
