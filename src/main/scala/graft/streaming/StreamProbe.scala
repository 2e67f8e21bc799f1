package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: runs the stateful streaming queries and prints the
  * per-micro-batch `StreamingQueryProgress` duration breakdown
  * (addBatch / getBatch / queryPlanning / walCommit / stateOperators),
  * so the cost of stream spin-up vs join/state work is measured, not
  * guessed. Findings land in PERF.md.
  *
  * With `xFactor > 1` a ×N events corpus is generated under
  * java.io.tmpdir (never the read-only fixtures): replicas re-key
  * event_id, shift ts by a few µs (same 30-day event-time window, so
  * watermark behavior stays realistic) and move to FRESH user ids — so
  * state (per-user aggregates, join buffers, dedup keys) grows
  * linearly with volume, which is exactly what a bigger deployment
  * does to a state store.
  *
  * Usage: `sbt "runMain graft.streaming.StreamProbe [sfDir] [xFactor]"`
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val x = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (x <= 1) base else stressDir(spark, base, x)

    // Warm-up at sf0.001: JIT + codegen + state-store infra
    Streams.queries.find(_.name == "stream_stream_join").get
      .fn(spark, "/root/testdata/sf0.001").count()

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
    for (name <- Seq("stream_stream_join", "stream_stateful_count", "stream_dedup")) {
      val fn = Streams.queries.find(_.name == name).get.fn
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name sf=$sfDir rows=$n total=$sec%.2f s")
    }
    Streams.lastProgressHook = null
    spark.stop()
  }

  /** ×N events corpus as the single FILE `$dir/events.parquet` the
    * streaming stager expects (coalesce(1) + move of the one part).
    */
  private def stressDir(spark: SparkSession, base: String, x: Int): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_events_stress_src_${x}x"
    val dest = new java.io.File(s"$dir/events.parquet")
    if (!dest.exists()) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      // jitter below is ns-long arithmetic; normalize a µs-typed
      // fixture to ns longs first (eventsStream adapts either way)
      val raw = spark.read.parquet(s"$base/events.parquet")
      val b =
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType) raw
        else graft.Tables.normalizeEventsTs(raw)
          .withColumn("ts", expr("unix_micros(ts) * 1000L"))
      val n = b.count()
      val reps = b.crossJoin(spark.range(1, x).toDF("r"))
        .select(
          (col("event_id") + col("r") * n).as("event_id"),
          (col("ts") + col("r") * 7919L).as("ts"), // ns-scale jitter, same window
          (col("user_id") + col("r") * 1000000L).as("user_id"), // fresh users → state grows
          col("event_type"), col("value"), col("props"))
      val stage = s"$dir/_stage"
      b.selectExpr(cols: _*).unionByName(reps)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file in $stage"))
      java.nio.file.Files.move(part.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[probe] generated ${x}x events corpus → $dest")
    }
    dir
  }
}
