package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only: does localCheckpoint inherit the origin plan's stats? */
object StatsProbe {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var labels = (0L until 100L).map(i => (i, i)).toDF("node", "lab").localCheckpoint()
    for (r <- 1 to 8) {
      val short = labels.as("s1").join(labels.as("s2"), col("s1.lab") === col("s2.node"))
        .select(col("s1.node").as("node"), col("s2.lab").as("lab"))
      labels = short.localCheckpoint()
      val sz = labels.queryExecution.optimizedPlan.stats.sizeInBytes
      println(s"[stats-probe] round $r sizeInBytes bits=${sz.bitLength}")
    }
    spark.stop()
  }
}
