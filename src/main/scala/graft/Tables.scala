package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver fixtures (TESTDATA.md / FIXTURES.md).
  *
  * Scale notes (100 TB mandate): every loader is a plain parquet scan —
  * Spark's vectorized columnar reader + Catalyst pushdown means filters
  * and projections applied downstream reach the scan. No caching, no
  * collect; loaders are cheap to call per query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Balance a CPU-heavy derivation over an under-split scan (guide
    * §2.5 "input skew": one huge unsplittable file → repartition right
    * after the read). A single-row-group parquet fixture (or a gzip
    * landing file at deployment) arrives as ONE scan task, so an
    * expensive per-row stage fused into the scan — tokenize + n-gram
    * explode + hash, vector math — runs serially while the rest of the
    * cluster idles. When the scan has fewer splits than the session's
    * parallelism, redistribute rows first; the exchange carries only
    * the projected input (cheap next to the serial stage it unblocks).
    * At warehouse scale a columnar scan has thousands of splits, so
    * this is a structural NO-OP — the cost is only ever paid when the
    * alternative is a single-core stage. Results are unaffected:
    * repartition is row-preserving, and every query here is
    * partitioning-independent by construction (the local[4]/local[32]
    * double-Verify gate).
    */
  def balanced(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // Split probe: df.rdd instantiates a throwaway physical plan just
    // to count the scan's splits — a one-time driver cost of a few ms
    // per query (r16 ADVICE; accepted knowingly: the probe plan is a
    // bare column-pruned scan, and no cheaper public API exposes the
    // split count before execution).
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** [[balanced]] for a frame with MULTIPLE consumers: when the scan
    * is under-split, the balancing exchange is additionally cut behind
    * a LAZY localCheckpoint so every consumer reads the repartitioned
    * blocks instead of re-executing the RoundRobin subtree per branch
    * (r16 verdict #1: a bare balanced frame consumed four times
    * stamped four full-fact exchanges into stat_spearman's plan). On a
    * well-split source this returns the scan untouched — NO
    * checkpoint, so a 100 TB fact is never materialized just to be
    * re-read; consumers re-scan the column-pruned parquet, which is
    * the cheaper move at any scale.
    */
  def balancedShared(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p)
      df.repartition(p).localCheckpoint(eager = false)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Normalizes an events scan's `ts` to a µs TimestampType column,
    * whatever physical type the fixture stores:
    *  - TIMESTAMP(NANOS) read as `bigint` ns under `nanosAsLong`
    *    (pre-round-9 fixtures): `ts div 1000` — exact integer
    *    truncation, matching DuckDB's native ns→µs read;
    *  - TIMESTAMP_NTZ µs (round-9+ fixtures): cast to TimestampType —
    *    value-preserving because the session timezone is pinned UTC;
    *  - already TimestampType: pass through.
    * Being schema-adaptive here (one place) keeps every events query
    * fixture-version-agnostic.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** `events` with `ts` normalized to a proper µs TimestampType column
    * (FIXTURES.md: Spark 4 refuses TIMESTAMP(NANOS) by default, hence
    * the `nanosAsLong` escape hatch, harmless for µs fixtures).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(table(s, d, "events"))
  }

  /** `events` with `ts` as raw nanosecond epoch longs. For a µs-typed
    * fixture the ns value is derived (×1000, zero sub-µs digits) so
    * callers keep a stable BIGINT contract across fixture versions.
    */
  def eventsRawNanos(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => normalizeEventsTs(raw)
        .withColumn("ts", expr("unix_micros(ts) * 1000L"))
    }
  }
}
