package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession.Builder pre-tuned for this
  * engine's workloads, with the native function extensions wired in.
  *
  * Cluster-scale knobs and the reasoning (defaults target local mode;
  * override per deployment):
  *  - AQE on (+ skew-join split + partition coalescing): runtime
  *    re-planning replaces hand-tuned shuffle counts at 100 TB.
  *  - `spark.sql.shuffle.partitions` should track total executor cores
  *    × 2-3 on a real cluster (the AQE coalescer trims the excess).
  *  - `spark.sql.files.maxPartitionBytes` (default 128m) governs scan
  *    parallelism; raise to 256-512m for wide-column parquet at scale.
  *  - `nanosAsLong` tolerates TIMESTAMP(NANOS) parquet (see Tables).
  *  - GraftExtensions injects `cosine_sim` (native codegen'd).
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  /** Build (or reuse) the tuned session. */
  def getOrCreate(master: String = "local[*]"): SparkSession =
    builder(master).getOrCreate()
}
