package graft.streaming

import graft.GraftSession

/** Diagnostic main: runs `stream_stream_join` once and prints the
  * per-micro-batch `StreamingQueryProgress` duration breakdown
  * (addBatch / getBatch / queryPlanning / walCommit / stateOperators),
  * so the cost of stream spin-up vs join work is measured, not guessed.
  * Findings land in PERF.md.
  *
  * Usage: `sbt "runMain graft.streaming.StreamProbe /root/testdata/sf0.1"`
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = Streams.queries.find(_.name == "stream_stream_join").get.fn

    // Warm-up at sf0.001: JIT + codegen + state-store infra
    fn(spark, "/root/testdata/sf0.001").count()

    sys.env.get("PROBE_SHUFFLE_PARTITIONS").foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))

    Streams.lastProgressHook = p => {
      val dur = p.durationMs
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"triggerMs=${dur.get("triggerExecution")} addBatchMs=${dur.get("addBatch")} " +
        s"getBatchMs=${dur.get("getBatch")} planMs=${dur.get("queryPlanning")} " +
        s"walMs=${dur.get("walCommit")} stateRows=" +
        p.stateOperators.map(_.numRowsTotal).mkString("/"))
    }
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] stream_stream_join sf=$sfDir rows=$n total=$sec%.2f s")
    Streams.lastProgressHook = null
    spark.stop()
  }
}
