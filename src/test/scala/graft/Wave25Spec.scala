package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-25 additions, asserted on sf0.001. */
class Wave25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("llm_grpo_advantage: advantages z-scored within group (mean ~0)") {
    val rows = q("llm_grpo_advantage").collect()
    assert(rows.length ==
      Tables.documents(spark, TestSpark.sf0001).count().toInt)
    val bySource = rows.filter(!_.isNullAt(3)).groupBy(_.getString(1))
    bySource.foreach { case (src, g) =>
      val advs = g.map(_.getDouble(3))
      val mean = advs.sum / advs.length
      assert(math.abs(mean) < 0.01, s"$src group mean $mean")
      // z-scores with n>=2: spread should be ~1
      val sd = math.sqrt(
        advs.map(a => (a - mean) * (a - mean)).sum / (advs.length - 1))
      assert(sd > 0.5 && sd < 1.5, s"$src sd $sd")
    }
  }

  test("llm_best_of_n: top-2 per source, rank-1 reward >= rank-2") {
    val rows = q("llm_best_of_n").collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.size == 20)
    bySource.foreach { case (_, g) =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == Seq(1L, 2L))
      assert(sorted(0).getLong(3) >= sorted(1).getLong(3))
    }
  }

  test("llm_chunk_dedup_rate: distinct <= chunks, rate consistent") {
    val rows = q("llm_chunk_dedup_rate").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (n, dn, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dn <= n && dn >= 1)
      assert(math.abs(rate - (n - dn).toDouble / n) < 1e-5)
    }
  }
}
