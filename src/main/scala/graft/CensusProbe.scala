package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only whole-surface structural census: for every query (or a
  * comma-list subset), one steady-state timed run with a listener
  * counting jobs (driver actions), stages, tasks and shuffle bytes.
  * The job count is the per-ACTION scheduler-latency exposure (PERF.md
  * r16 adjudication: this box bursts to 0.24-0.5 s per empty job), the
  * stage/shuffle columns are the guide-§2 exchange census. Not part of
  * the driver contract; Bench remains the official number.
  * Usage: runMain graft.CensusProbe <sfDir> [name1,name2,...]
  */
object CensusProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufR = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warm-up pass at dir itself (mirrors Bench: memo builds + JIT)
    queries.foreach { case (_, fn) =>
      try fn(spark, dir).count() catch { case _: Throwable => () }
    }
    // reps > 1: report the MIN total across reps (contention-resistant,
    // the Bench gate's own statistic); counters are from the last rep.
    val reps = sys.env.getOrElse("SPARK_GRAFT_CENSUS_REPS", "1").toInt
    println("[census] name totalSec buildSec planSec jobs stages tasks shufReadMB shufWriteMB")
    queries.foreach { case (name, fn) =>
      try {
        var bestTotal = Double.MaxValue
        var bestBuild = 0.0; var bestPlan = 0.0
        for (_ <- 1 to reps) {
          jobs.set(0); stages.set(0); tasks.set(0); shufR.set(0L); shufW.set(0L)
          val t0 = System.nanoTime()
          val df = fn(spark, dir)           // build + analysis (+ any eager
          val t1 = System.nanoTime()        //   model jobs inside fn)
          df.queryExecution.executedPlan    // optimizer + physical planning
          val t2 = System.nanoTime()
          df.count()
          val t3 = System.nanoTime()
          val tot = (t3 - t0) / 1e9
          if (tot < bestTotal) {
            bestTotal = tot
            bestBuild = (t1 - t0) / 1e9; bestPlan = (t2 - t1) / 1e9
          }
        }
        // listener events are async; drain before reading the counters
        org.apache.spark.sql.graftbridge.Bridge.waitListenerBusEmpty(spark)
        println(f"[census] $name%-28s ${bestTotal}%7.3f ${bestBuild}%7.3f ${bestPlan}%7.3f ${jobs.get}%4d ${stages.get}%5d ${tasks.get}%6d ${shufR.get / 1e6}%10.2f ${shufW.get / 1e6}%10.2f")
      } catch { case e: Throwable =>
        println(s"[census] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
