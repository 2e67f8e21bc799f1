package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-35 ts-complexity additions. */
class Wave35Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  private lazy val dailySeries: Array[Long] =
    Tables.events(spark, TestSpark.sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .orderBy("day").collect().map(_.getLong(1))

  test("ts_permutation_entropy: normalized to [0,1], window accounting") {
    val r = q("ts_permutation_entropy").collect().head
    val nw = r.getLong(0)
    assert(nw == dailySeries.length - 2)
    assert(r.getLong(1) <= 6L)
    val pe = r.getDouble(2)
    assert(pe >= 0.0 && pe <= 1.0, s"normalized PE out of range: $pe")
  }

  test("ts_spectral_entropy: normalized to [0,1] over the 11-period band") {
    val r = q("ts_spectral_entropy").collect().head
    assert(r.getLong(0) == 11L)
    val h = r.getDouble(1)
    assert(h >= 0.0 && h <= 1.0, s"normalized H out of range: $h")
  }

  test("ts_sample_entropy: A <= B (a 3-match is a 2-match) and brute force agrees") {
    val r = q("ts_sample_entropy").collect().head
    val (n, bC, aC) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n == dailySeries.length)
    assert(aC <= bC, s"A=$aC must be <= B=$bC")
    // brute force with the same sigma definition
    val xs = dailySeries.map(_.toDouble)
    val mean = xs.sum / xs.length
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1))
    val rTol = 0.2 * sd
    var b = 0L; var a = 0L
    for (i <- 0 until xs.length - 1; j <- i + 1 until xs.length - 1) {
      if (math.max(math.abs(xs(i) - xs(j)),
          math.abs(xs(i + 1) - xs(j + 1))) <= rTol) {
        b += 1
        if (i < xs.length - 2 && j < xs.length - 2 &&
            math.abs(xs(i + 2) - xs(j + 2)) <= rTol) a += 1
      }
    }
    assert(b == bC, s"brute B=$b vs query $bC")
    assert(a == aC, s"brute A=$a vs query $aC")
    if (aC > 0 && bC > 0)
      assert(math.abs(-math.log(aC.toDouble / bC) - r.getDouble(3)) < 1e-3)
  }

  test("ts_higuchi_fd: dimension of a 1-D curve lies in [1, 2] (tolerown noise)") {
    val fd = q("ts_higuchi_fd").collect().head.getDouble(0)
    // finite-sample estimates can drift slightly outside the ideal
    // [1, 2] band; assert a sane envelope
    assert(fd > 0.5 && fd < 2.5, s"implausible Higuchi FD: $fd")
  }
}
