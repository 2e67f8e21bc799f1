package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only stage-level wall-clock tracer for ONE query: prints every
  * stage >100 ms with task count. Usage: runMain graft.JobProbe <sfDir> <name>
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (ms > 100) println(f"[stage] ${si.stageId}%4d ${ms}%6d ms ${si.numTasks}%5d tasks")
      }
    })
    SparkEntry.queries(args(1))(spark, "/root/testdata/sf0.001").count()
    println("[warm done]")
    val t0 = System.nanoTime()
    SparkEntry.queries(args(1))(spark, args(0)).count()
    println(f"[total] ${(System.nanoTime()-t0)/1e9}%6.2f s")
    spark.stop()
  }
}
