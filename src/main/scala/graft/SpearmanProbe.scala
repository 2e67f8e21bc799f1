package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage-level timing probe for stat_spearman (r11 verdict
  * item #2; reshaped r13 alongside the query): times each seam of the
  * two-scan bounded-domain rank pipeline separately at driver
  * conditions so the cost can be attributed. Stages: (1) the
  * domain-bounded (flag, quantity) freq collect + driver ranks,
  * (2) the raw-fact → (flag, price) cell aggregate (the only
  * fact-sized shuffle), (3) the grouped prefix-sum ranking device,
  * (4) the final per-flag moment aggregate.
  * Usage: runMain graft.SpearmanProbe [sfDir]
  */
object SpearmanProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[spearman-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up
    time("warmup sf0.001") {
      SparkEntry.queries("stat_spearman")(spark, "/root/testdata/sf0.001").count()
    }
    (1 to 2).foreach { rep =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,0)")
      val fact = Tables.lineitem(spark, d)
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
      val rq = time(s"[$rep] fq collect + driver ranks") {
        val fq = fact.groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("cnt"))
        val fqSchema = fq.schema
        val fqRows = fq.collect()
        def qnum(r: org.apache.spark.sql.Row): Double = r.get(1) match {
          case b: java.math.BigDecimal => b.doubleValue
          case n: Number => n.doubleValue
          case _ => 0.0
        }
        val rqRows: Seq[org.apache.spark.sql.Row] =
          fqRows.groupBy(_.get(0)).toSeq.flatMap { case (_, rs) =>
            var cum = 0L
            rs.sortBy(qnum).map { r =>
              val cnt = r.getLong(2)
              val r2 = 2 * cum + cnt + 1
              cum += cnt
              org.apache.spark.sql.Row(r.get(0), r.get(1), r2)
            }
          }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rqRows, 1),
          org.apache.spark.sql.types.StructType(fqSchema.fields.take(2) :+
            org.apache.spark.sql.types.StructField("r2_q",
              org.apache.spark.sql.types.LongType)))
      }
      val cells = time(s"[$rep] raw-fact cells agg (materialize)") {
        val c = fact.join(broadcast(rq), Seq("l_returnflag", "l_quantity"))
          .groupBy(col("l_returnflag"), col("l_extendedprice"))
          .agg(count(lit(1)).as("cnt"),
            sum(dec(col("r2_q"))).as("sqx"),
            sum(dec(col("r2_q")) * dec(col("r2_q"))).as("sqx2"))
          .localCheckpoint()
        c.count(); c
      }
      val dev = time(s"[$rep] ranking device (materialize)") {
        graft.api.Ranking.withGroupedPrefixSum(cells,
            Seq("l_returnflag"), Seq(col("l_extendedprice")), col("cnt"),
            outCol = "cumb", partitions = 8)
          .withColumn("r2_p", col("cumb") * 2 + col("cnt") + 1)
          .localCheckpoint()
      }
      time(s"[$rep] final agg") {
        dev.groupBy("l_returnflag")
          .agg(sum("cnt").cast("long").as("n"), sum(col("sqx")).as("sx"))
          .count()
      }
    }
    spark.stop()
  }
}
