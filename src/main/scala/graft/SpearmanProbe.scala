package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage-level timing probe for stat_spearman (r11 verdict
  * item #2): times each seam of the two-pass bounded-domain rank
  * device separately at driver conditions so the 2.9-4.7 s cost can
  * be attributed. Usage: runMain graft.SpearmanProbe [sfDir]
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
      val c3 = time(s"[$rep] c3 fact agg+checkpoint") {
        val c = Tables.lineitem(spark, d)
          .groupBy(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        c.count(); c
      }
      val rq = time(s"[$rep] fq collect + driver ranks") {
        val fq = c3.groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(sum(col("cnt")).as("cnt"))
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
      val cells = time(s"[$rep] cells join+agg+checkpoint") {
        val c = c3.join(broadcast(rq), Seq("l_returnflag", "l_quantity"))
          .groupBy(col("l_returnflag"), col("l_extendedprice"))
          .agg(sum(col("cnt")).as("cnt"),
            sum(dec(col("cnt")) * dec(col("r2_q"))).as("sqx"),
            sum(dec(col("cnt")) * dec(col("r2_q")) * dec(col("r2_q")))
              .as("sqx2"))
          .localCheckpoint()
        c.count(); c
      }
      val dev = time(s"[$rep] ranking device (materialize)") {
        graft.api.Ranking.withGroupedPrefixSum(cells,
            Seq("l_returnflag"), Seq(col("l_extendedprice")), col("cnt"),
            outCol = "cumb")
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
