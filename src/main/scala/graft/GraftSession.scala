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

  /** Pass-through conf: set to a `thrift://host:port` URI to point the
    * Catalog API at a LIVE Hive metastore instead of the embedded/
    * in-memory catalog. [[builder]] translates it to the two settings a
    * Hive-backed session needs (`hive.metastore.uris` + Hive catalog
    * implementation) and enables Hive support. Tests cover the conf
    * plumbing only — this offline environment has no thrift endpoint
    * (SURVEY §7.5); everything in [[graft.api.Catalog]] goes through
    * `spark.catalog`, so no other code changes when this is set.
    */
  val MetastoreUriKey = "spark.graft.metastore.uri"

  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      metastoreUri: Option[String] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    metastoreUri
      .orElse(sys.props.get(MetastoreUriKey))
      .fold(b) { uri =>
        metastoreConf(uri).foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
          .enableHiveSupport()
      }
  }

  /** The conf pairs a metastore URI expands to — factored pure so the
    * plumbing is assertable in tests without a live thrift endpoint.
    * Rejects non-thrift URIs early: a silently-misspelled scheme would
    * otherwise fall back to the embedded Derby catalog and "work".
    */
  def metastoreConf(uri: String): Seq[(String, String)] = {
    require(uri.startsWith("thrift://"),
      s"$MetastoreUriKey must be a thrift://host:port URI, got: $uri")
    Seq(
      MetastoreUriKey -> uri,
      "hive.metastore.uris" -> uri,
      "spark.sql.catalogImplementation" -> "hive")
  }

  /** Build (or reuse) the tuned session. */
  def getOrCreate(master: String = "local[*]"): SparkSession =
    builder(master).getOrCreate()
}
