package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-31 additions, asserted on sf0.001. */
class Wave31Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_cuped: arm accounting and theta matches brute force") {
    val r = q("stat_cuped").collect().head
    val nUsers = Tables.events(spark, TestSpark.sf0001)
      .select("user_id").distinct().count()
    assert(r.getLong(0) == nUsers)
    assert(r.getLong(1) + r.getLong(2) == nUsers)
    val vr = r.getDouble(6)
    assert(vr >= 0.0 && vr <= 1.0, s"corr^2 out of range: $vr")
    // brute-force theta from the per-user (pre, post) cent pairs
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val xy = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect()
      .groupBy(_.getLong(0)).values.map { rows =>
        val x = rows.filter(_.getTimestamp(1).before(cut)).map(_.getLong(2)).sum
        val y = rows.filterNot(_.getTimestamp(1).before(cut)).map(_.getLong(2)).sum
        (x.toDouble, y.toDouble)
      }.toArray
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(3) - theta) < 1e-4,
      s"theta ${r.getDouble(3)} vs brute $theta")
  }

  test("stat_meta_analysis: pooled effect inside the stratum range") {
    val r = q("stat_meta_analysis").collect().head
    assert(r.getLong(0) >= 1L && r.getLong(0) <= 7L)
    assert(r.getDouble(2) > 0.0) // se
    assert(r.getDouble(3) >= -1e-9) // Cochran Q
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // I^2
    // fixed-effect pooling is a convex combination of stratum effects
    val eff = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .groupBy(year(col("o_orderdate")).as("yr"),
        (col("o_orderpriority") === "1-URGENT").as("t"))
      .agg(count(lit(1)).as("n"), avg("o_totalprice").as("m"))
      .collect()
      .groupBy(_.getInt(0)).collect {
        case (_, rows) if rows.length == 2 && rows.forall(_.getLong(2) > 1) =>
          val mt = rows.find(_.getBoolean(1)).get.getDouble(3)
          val mc = rows.find(!_.getBoolean(1)).get.getDouble(3)
          mt - mc
      }.toSeq
    assert(r.getDouble(1) >= eff.min - 1e-6 && r.getDouble(1) <= eff.max + 1e-6)
  }

  test("ts_piecewise_trend: knot in grid, never worse than the line") {
    val r = q("ts_piecewise_trend").collect().head
    assert(r.getInt(0) >= 5 && r.getInt(0) <= 24)
    assert(r.getDouble(3) <= r.getDouble(4) + 1e-6,
      "two free segments can always reproduce the single line")
    assert(r.getDouble(5) >= -1e-9 && r.getDouble(5) <= 1.0)
  }
}
