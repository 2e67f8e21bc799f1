package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only probe: the r11 `cellPairs` rewrite (collect_set + in-row
  * C(k,2) HOF expansion) cut ktruss' exchanges but hits/boruvka
  * regressed ~1.5x isolated vs r10. Hypothesis: the nested
  * `transform(..., slice(...))` lambda evaluates INTERPRETED per
  * element (PERF.md round-10 lesson #2) and allocates per slice —
  * the pair enumeration itself got slower. This times three
  * semantically identical builds of the hour-cell pair set at sf0.1:
  *   A: current cellPairs (nested-HOF expansion)
  *   B: native posexplode + slice + explode (no lambdas)
  *   C: r10 wedge self-join (ae x ae on cell, u<v)
  * Usage: runMain graft.PairsProbe [sfDir]
  */
object PairsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[pairs-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val MaxCellUsers = 12
    def rows: DataFrame = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")).as("h"))

    def cells: DataFrame = rows
      .groupBy(col("event_type"), col("h"))
      .agg(sort_array(collect_set(col("user_id"))).as("us"))
      .filter(size(col("us")).between(2, MaxCellUsers))

    def variantA: DataFrame = cells
      .select(explode(expr(
        "flatten(transform(us, (x, i) -> " +
          "transform(slice(us, i + 2, size(us)), " +
          "y -> struct(x AS u, y AS v))))")).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .distinct()

    def variantB: DataFrame = cells
      .select(posexplode(col("us")).as(Seq("i", "u")), col("us"))
      .select(col("u"),
        explode(slice(col("us"), col("i") + lit(2), size(col("us"))))
          .as("v"))
      .distinct()

    def variantC: DataFrame = {
      val ae0 = rows.distinct()
      val okc = ae0.groupBy("event_type", "h")
        .agg(count(lit(1)).as("nc"))
        .filter(col("nc").between(2, MaxCellUsers))
        .select("event_type", "h")
      val ae = ae0.join(okc, Seq("event_type", "h"))
      val b = ae.select(col("event_type"), col("h"),
        col("user_id").as("v"))
      ae.select(col("event_type"), col("h"), col("user_id").as("u"))
        .join(b, Seq("event_type", "h"))
        .filter(col("u") < col("v"))
        .select("u", "v").distinct()
    }

    (1 to 3).foreach { rep =>
      val na = time(s"[$rep] A nested-HOF cellPairs")(variantA.count())
      val nb = time(s"[$rep] B posexplode+slice native")(variantB.count())
      val nc = time(s"[$rep] C wedge self-join (r10)")(variantC.count())
      println(s"[pairs-probe] [$rep] counts A=$na B=$nb C=$nc")
      require(na == nb && nb == nc, "variants disagree!")
    }
    spark.stop()
  }
}
