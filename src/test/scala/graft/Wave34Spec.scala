package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-34 additions, asserted on sf0.001. */
class Wave34Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_bartlett: T >= 0 (Jensen) and group accounting") {
    val r = q("stat_bartlett").collect().head
    val k = r.getLong(0)
    val n = r.getLong(1)
    val t = r.getDouble(2)
    assert(k >= 2, s"needs >=2 flags, got $k")
    assert(n == Tables.lineitem(spark, TestSpark.sf0001).count())
    // pooled variance is the weighted mean of group variances and ln is
    // concave, so the Bartlett numerator (hence T, with C > 0) is >= 0
    assert(t >= 0.0, s"Bartlett T must be >= 0, got $t")
  }

  test("stat_dunn_test: z matches a brute-force midrank computation") {
    val rows = q("stat_dunn_test").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val data = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("l_quantity").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val n = data.length.toDouble
    // midranks over the pooled sample
    val byVal = data.map(_._2).groupBy(identity).view
      .mapValues(_.length).toSeq.sortBy(_._1)
    var cum = 0L
    val rank = byVal.map { case (v, c) =>
      val r = cum + (c + 1) / 2.0; cum += c; v -> r
    }.toMap
    val ties = byVal.map { case (_, c) =>
      c.toLong * c * c - c }.sum.toDouble
    val groups = data.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toDouble, xs.map(x => rank(x._2)).sum / xs.length)
    }.toMap
    for (((fa, fb), z) <- rows) {
      val (na, ra) = groups(fa)
      val (nb, rb) = groups(fb)
      val v = (n * (n + 1) / 12.0 - ties / (12.0 * (n - 1))) *
        (1.0 / na + 1.0 / nb)
      val expect = (ra - rb) / math.sqrt(v)
      assert(math.abs(expect - z) < 2e-4,
        s"dunn z($fa,$fb): got $z expected $expect")
    }
  }

  test("stat_page_trend: L within the permutation-extreme bounds") {
    val r = q("stat_page_trend").collect().head
    val b = r.getLong(0).toDouble
    val l = r.getLong(1).toDouble
    // per block, Σ j·R over a permutation of 1..7 lies in [84, 140]
    assert(l >= 84 * b && l <= 140 * b, s"L=$l outside [84b, 140b], b=$b")
    assert(!r.getDouble(2).isNaN)
  }

  test("stat_bowker_symmetry: chi2 >= 0, df bounded by event-type pairs") {
    val r = q("stat_bowker_symmetry").collect().head
    val k = Tables.events(spark, TestSpark.sf0001)
      .select("event_type").distinct().count()
    assert(r.getLong(0) <= k * (k - 1) / 2)
    assert(r.getDouble(1) >= 0.0)
  }
}
