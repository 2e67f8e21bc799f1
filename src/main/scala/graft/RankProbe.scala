package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic main: measure the scale-safe ranking primitives
  * (graft.api.Ranking) against the single-partition window functions
  * they replace, beyond fixture scale.
  *
  * The synthetic input is `spark.range(n)` with a deterministic
  * pseudo-random sort value (xxhash64 of the id) — no file I/O, so the
  * timing isolates the two plan shapes:
  *   - plain `ntile(k) OVER (ORDER BY v, id)`: every row through ONE
  *     window task (the scale-killer being replaced);
  *   - `Ranking.ntileExact`: literal-boundary buckets + per-bucket
  *     local windows + a ≤p-row prefix sum;
  *   - `Ranking.withGroupedRowNumber` vs `row_number() OVER (PARTITION
  *     BY 5-value group ORDER BY …)` — the few-large-groups case
  *     (stat_gini's shape).
  *
  * Usage: `sbt "runMain graft.RankProbe [nList]"`, default
  * `1000000,5000000`. Results recorded in PERF.md.
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val ns = args.headOption.getOrElse("1000000,5000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[rank-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$r)")
    }

    ns.foreach { n =>
      val df = spark.range(n)
        .select(col("id"),
          (xxhash64(col("id")) % 1000000L).cast("double").as("v"),
          (col("id") % 5).cast("string").as("grp"))
      val sort = Seq(col("v"), col("id"))

      time(s"n=$n plain global ntile(100) window") {
        df.withColumn("t", ntile(100).over(Window.orderBy(sort: _*)))
          .groupBy("t").count().count()
      }
      time(s"n=$n Ranking.ntileExact(100)") {
        graft.api.Ranking.ntileExact(df, 100, sort)
          .groupBy("__ntile").count().count()
      }
      time(s"n=$n plain per-group row_number (5 groups)") {
        df.withColumn("rn",
            row_number().over(Window.partitionBy("grp").orderBy(sort: _*)))
          .groupBy("grp").agg(max("rn")).count()
      }
      time(s"n=$n Ranking.withGroupedRowNumber (5 groups)") {
        graft.api.Ranking.withGroupedRowNumber(df, Seq("grp"), sort)
          .groupBy("grp").agg(max("__rn")).count()
      }
    }
    spark.stop()
  }
}
