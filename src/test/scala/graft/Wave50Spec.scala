package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-50 additions (llm_dupcluster_sources,
  * stat_sign_test).
  */
class Wave50Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("llm_dupcluster_sources: share bounds, diversity accounting") {
    val rows = q("llm_dupcluster_sources").collect()
    rows.foreach { r =>
      val (nDocs, nSrc, share) =
        (r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(nDocs > 1, "only multi-doc clusters are reported")
      assert(nSrc >= 1 && nSrc <= nDocs)
      assert(share > 0.0 && share <= 1.0)
      // dominant share can't be below an even split
      // share is rounded to 4dp, so allow a half-ulp of that rounding
      assert(share + 1e-4 >= 1.0 / nSrc,
        s"top share $share below even split of $nSrc sources")
      if (nSrc == 1) assert(share == 1.0)
    }
  }

  test("stat_sign_test: counts reconcile with the day series") {
    val r = q("stat_sign_test").collect().head
    val (pos, neg, z) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(pos >= 0 && neg >= 0 && pos + neg >= 1)
    assert(z >= 0.0)
    val days = Tables.events(spark, TestSpark.sf0001)
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")))
      .count().count()
    assert(pos + neg <= days - 1, "at most n-1 nonzero differences")
  }
}
