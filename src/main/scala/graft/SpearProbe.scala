package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
object SpearProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = List.empty[(Int, Long, Long)]
    val starts = scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach(t0 =>
          jobs = (j.jobId, t0, System.nanoTime()) :: jobs)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val ms = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        if (ms > 100) println(f"[stage] ${si.stageId}%4d ${ms}%6d ms  ${si.numTasks}%4d tasks  ${si.name.take(80)}")
      }
    })
    // warm
    SparkEntry.queries("stat_spearman")(spark, "/root/testdata/sf0.001").count()
    Thread.sleep(500); jobs = Nil
    val t0 = System.nanoTime()
    SparkEntry.queries("stat_spearman")(spark, "/root/testdata/sf0.1").count()
    println(f"[total] ${(System.nanoTime()-t0)/1e9}%6.2f s")
    jobs.sortBy(_._1).foreach { case (id, s0, e0) =>
      println(f"[job] $id%4d start=${(s0-t0)/1e6}%7.0f ms dur=${(e0-s0)/1e6}%7.0f ms")
    }
    spark.stop()
  }
}
