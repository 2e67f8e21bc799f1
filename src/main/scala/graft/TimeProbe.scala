package graft

import org.apache.spark.sql.SparkSession

/** Dev-only per-query wall-clock probe: runs each named query once
  * (after one warm-up) and prints seconds. Not part of the driver
  * contract; Bench remains the official number.
  * Usage: runMain graft.TimeProbe <sfDir> <name1,name2,...>
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up at sf0.001 per query shape (mirrors Bench)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $n%-28s ${sec}%7.2f s  ($cnt rows)")
    }
    spark.stop()
  }
}
