package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-29 additions, asserted on sf0.001. */
class Wave29Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_effect_sizes: bounds, sign agreement, Hedges |g| < |d|") {
    val r = q("stat_effect_sizes").collect().head
    val (d, g, glass, cliffs) =
      (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(cliffs >= -1.0 && cliffs <= 1.0)
    // J < 1 shrinks toward zero without flipping sign
    assert(math.abs(g) < math.abs(d) || d == 0.0)
    assert(g * d >= 0.0 && glass * d >= 0.0)
    // all four must agree with the raw mean difference's sign
    val md = r.getDouble(2)
    assert(md * d >= 0.0 && md * cliffs >= 0.0)
  }

  test("stat_effect_sizes: cliffs delta matches brute force on the fixture") {
    val rows = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
    val x = rows.filter(_.getString(0) == "click").map(_.getDouble(1))
    val y = rows.filter(_.getString(0) == "view").map(_.getDouble(1))
    var gt = 0L; var lt = 0L
    for (a <- x; b <- y) { if (a > b) gt += 1 else if (a < b) lt += 1 }
    val want = (gt - lt).toDouble / (x.length.toLong * y.length)
    val got = q("stat_effect_sizes").collect().head.getDouble(6)
    assert(math.abs(got - want) < 1e-6, s"cliffs $got vs brute $want")
  }

  test("agg_kanonymity: class counts are consistent") {
    val r = q("agg_kanonymity").collect().head
    val (nRows, nClasses, kMin) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nRows == Tables.customer(spark, TestSpark.sf0001).count())
    assert(kMin >= 1L && nClasses >= 1L && kMin * nClasses <= nRows)
    assert(r.getLong(3) <= nClasses) // classes below k
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    assert(r.getLong(5) <= nClasses) // l-diversity-1 classes
  }

  test("llm_ndcg_retrieval: ndcg in (0,1], mrr/precision bounded") {
    val r = q("llm_ndcg_retrieval").collect().head
    val (dcg, idcg, ndcg, mrr, p10) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(idcg >= dcg - 1e-9, "ideal ranking can never trail the actual")
    assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-9)
    assert(mrr >= 0.0 && mrr <= 1.0)
    assert(p10 >= 0.0 && p10 <= 1.0)
    assert(r.getLong(0) > 0) // pool nonempty on the fixture corpus
  }
}
