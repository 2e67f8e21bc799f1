package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-21 additions, asserted on sf0.001. */
class Wave21Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("llm_lsh_bucket_stats: per-band audit bounds the real pair expansion") {
    val rows = q("llm_lsh_bucket_stats").collect()
    assert(rows.length == 4) // BANDS
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))  // singletons <= buckets
      assert(r.getLong(3) >= 1L)
      assert(r.getLong(4) >= 0L)
    }
    // the distinct candidate-pair set is bounded by the per-band sum
    val bound = rows.map(_.getLong(4)).sum
    val actual = q("llm_lsh_candidate_pairs").count()
    assert(actual <= bound, s"pairs $actual > bound $bound")
  }

  test("ts_retention_halflife: 7 points, halflife present iff decaying") {
    val r = q("ts_retention_halflife").collect().head
    assert(r.getLong(0) == 7L)
    val slope = r.getDouble(1)
    if (slope < 0) assert(r.getDouble(2) > 0.0)
    else assert(r.isNullAt(2)) // churn-free synthetic fixture: flat curve
  }
}
