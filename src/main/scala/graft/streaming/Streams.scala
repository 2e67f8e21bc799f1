package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.Q
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Spark 4 StatefulProcessor: per-user running sum in a ValueState. */
class RunningValueSum
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), (Long, Double)] {
  @transient private var sumState: org.apache.spark.sql.streaming.ValueState[Double] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    sumState = getHandle.getValueState[Double]("sum", Encoders.scalaDouble,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Double)] = {
    val prev = if (sumState.exists()) sumState.get() else 0.0
    val next = prev + rows.map(_._2).sum
    sumState.update(next)
    Iterator((key, next))
  }
}

/** Exact-integer running (count, cents) per key — the oracle-able
  * TransformWithState processor: the running COUNT is strictly
  * monotone across emissions, so the per-key FINAL state is
  * recoverable from an append sink as the max-count row, and cents
  * accumulate as exact longs (no float drift across micro-batch
  * splits). Used by stream_tws_catchup.
  */
class RunningCountCents
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  @transient private var st:
    org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("cc",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long)] = {
    val (pn, pc) = if (st.exists()) st.get() else (0L, 0L)
    var n = pn; var c = pc
    rows.foreach { r => n += 1; c += r._2 }
    st.update((n, c))
    Iterator((key, n, c))
  }
}

/** §2.I — Structured Streaming operators.
  *
  * Each declared query runs a REAL streaming job over the events fixture
  * as a bounded file source (`readStream` → transform → sink →
  * `processAllAvailable` → stop) and returns the sink contents as a
  * batch DataFrame, so the driver's rows>0 / count harness applies.
  *
  * Oracles (r13): a streaming query IS batch-oracle-able whenever its
  * final sink contents are provably batch-equal — complete-mode aggs
  * (last overwrite = full aggregate, split-independent), stateless
  * transforms/joins (exactly-once append = batch result), and
  * watermark-FINALIZED append aggs (single staged source file ⇒ one
  * data batch ⇒ final watermark = max event time − delay, so the
  * finalized set is the batch aggregate filtered on window end ≤ wm —
  * the catch-up twins' device, applied to the memory-sink bases too).
  * Oracles stay legitimately omitted only where the output is
  * engine-specific: HLL sketch values (stream_sliding) and update-mode
  * float accumulation order (stream_transformwithstate); SURVEY.md §2.I
  * records the sanctioned list. Windowed/watermark semantics are
  * additionally cross-checked by the batch twins (`heat_daily`,
  * `win_range_frame`) and StreamingSpec's MemoryStream cases.
  *
  * Scale notes: state is bounded by watermarks everywhere state exists
  * (windowed aggs, dedup, stream-stream join); session windows merge
  * per user key; the memory sink is test-scale only — production sinks
  * would be kafka/parquet via the same writeStream API (exercised by
  * stream_foreachbatch).
  */
object Streams {

  private val nameCounter = new AtomicInteger(0)

  /** Per-JVM home for stream_dedup_index's bucketed artifact. */
  private lazy val streamIdxLocation =
    java.nio.file.Files.createTempDirectory("graft_stream_idx").toString

  /** table → source fingerprint for the standing corpus index (the
    * Llm.bandIndexMemo convention): rebuild only when the fixture
    * changes, not on every invocation.
    */
  private val streamIdxMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One entry per staged-source fingerprint; computeIfAbsent serializes
    * concurrent stagers of the same fixture (the map value is just a
    * completion token — the staged path itself is derived from the key).
    */
  private val stagedDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Serializes the shuffle-partition conf flip in [[runToMemory]] so two
    * overlapping streaming queries cannot interleave set/restore and leak
    * a stale partition count into the shared session.
    */
  private val runLock = new Object

  /** Diagnostic hook (StreamProbe): invoked with every micro-batch's
    * StreamingQueryProgress after a query drains. Null when unused.
    */
  @volatile var lastProgressHook: org.apache.spark.sql.streaming.StreamingQueryProgress => Unit = null

  // ts physical type varies by fixture version (ns-long vs µs NTZ);
  // eventsStream infers it from the staged file via a batch read.

  /** The file stream source requires a DIRECTORY of files; stage the
    * events fixture into a per-sfDir temp dir once (idempotent copy) —
    * this also models the real deployment shape (files arriving in a
    * watched directory). The dir is keyed by the source fingerprint,
    * NOT a random temp name: persistent checkpoints
    * (stream_availablenow_catchup) record the source path in their
    * offset log, so the staged path must be stable across JVM runs.
    */
  private def stageEventsDir(d: String): String = stageDir(d, "events")

  private def stageDir(d: String, tbl: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val f = new java.io.File(s"$d/$tbl.parquet")
    val key =
      s"${tbl}_${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
    // computeIfAbsent both memoizes and SERIALIZES staging per key: a
    // second caller blocks until the first finishes, so nobody reads a
    // half-staged file. The copy lands under a temp name and is
    // ATOMIC_MOVE'd into place — a crash mid-copy leaves only the temp
    // file, never a truncated events.parquet that would pass the
    // exists() check on the next run (the fingerprint key is unchanged
    // after a crash, so a truncated final file would poison every later
    // streaming query, including persistent AvailableNow checkpoints).
    stagedDirs.computeIfAbsent(key, _ => {
      val target = Paths.get(s"${sys.props("java.io.tmpdir")}/graft_stream_$key")
      val dest = target.resolve(s"$tbl.parquet")
      if (!Files.exists(dest)) {
        Files.createDirectories(target)
        val tmp = Files.createTempFile(target, ".staging_", ".parquet")
        Files.copy(Paths.get(s"$d/$tbl.parquet"), tmp,
          StandardCopyOption.REPLACE_EXISTING)
        try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
        catch {
          // another JVM won the race between our exists() and move —
          // its completed copy is equally valid; discard ours
          case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp)
        }
      }
      target.toString
    })
  }

  /** events as a streaming source with ts normalized to a µs timestamp.
    * The file stream source needs a static schema upfront, so the
    * actual physical schema is inferred with a one-footer batch read of
    * the staged copy; Tables.normalizeEventsTs then adapts ts whatever
    * that schema says (ns-long or µs NTZ fixture).
    */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageEventsDir(d)
    val physical = s.read.parquet(dir).schema
    graft.Tables.normalizeEventsTs(s.readStream.schema(physical).parquet(dir))
  }

  private val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** documents as a streaming source (crawl batches arriving in a
    * watched directory — the ingest shape of a curation pipeline).
    */
  private def documentsStream(s: SparkSession, d: String): DataFrame =
    s.readStream.schema(documentsSchema).parquet(stageDir(d, "documents"))

  private val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** embeddings as a streaming source (daily embedding deliveries
    * arriving in a watched directory — the ANN-ingest twin of
    * [[documentsStream]]).
    */
  private def embeddingsStream(s: SparkSession, d: String): DataFrame =
    s.readStream.schema(embeddingsSchema).parquet(stageDir(d, "embeddings"))

  /** fixture key → frozen codebook for stream_ann_append's persisted
    * IVF artifact (build + stream-drain run once per fixture, the
    * streamIdxMemo convention).
    */
  private val streamAnnMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Double]]]()

  /** fixture key → frozen (coarse, pq) codebooks for
    * stream_ivfpq_append's persisted CODED artifact (same convention).
    */
  private val streamPqMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Array[Double]], Array[Array[Array[Double]]])]()

  /** Run a streaming DataFrame to completion into a memory sink and
    * return its final contents.
    *
    * Stateful-operator cost per micro-batch scales with shuffle
    * partitions × state stores (a stream-stream join keeps 4 stores per
    * partition, and EVERY batch — including the no-data watermark-flush
    * batch — commits every store). Measured with StreamProbe at sf0.1:
    * 32 partitions → 6.1 s, 8 partitions → 2.8 s for the same join, the
    * difference being pure store-commit overhead. Streaming queries
    * here therefore run with a small partition count sized to the
    * fixture scale (override with `spark.graft.stream.shufflePartitions`
    * — a 1000-executor deployment with millions of state rows per
    * partition wants cores×2, exactly like batch). The session conf is
    * restored afterwards; each query uses a fresh temp checkpoint, so
    * no state-compatibility constraint crosses queries.
    *
    * The whole run holds [[runLock]]: the conf flip is session-global, so
    * two overlapping streaming queries could otherwise interleave
    * set/restore and strand the session at 8 partitions. Batch work
    * issued concurrently on the SAME session would still observe the
    * reduced setting for the duration of a streaming query — callers who
    * need concurrent batch + streaming should give the streaming side
    * its own `spark.newSession()` (shared SparkContext, isolated conf).
    */
  private def runToMemory(df: DataFrame, mode: String): DataFrame = runLock.synchronized {
    val s = df.sparkSession
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    // Default 8 → 4 (r16 optimization, same instrument as the r3
    // measurement): halving the store count halves the fixed
    // per-batch commit cost again — stream_stream_outer 3.03 → 2.58 s,
    // stream_stream_join 2.78 → 2.38 s, dedup/late_data/sliding each
    // ≈ −0.1 s — while 4-way parallelism still covers the fixture
    // compute (2 partitions re-inflates the compute-bound
    // stream_session 2.7 → 3.9 s, so 4 is the floor's knee, not a
    // race to 1). The production contract is unchanged: size this to
    // state volume (cores×2 on a real cluster), not to the default.
    s.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.graft.stream.shufflePartitions", "4"))
    // Dev-only A/B knob (r13 verdict Next #5): GRAFT_STREAM_ROCKSDB=1
    // flips the state store to the in-box RocksDBStateStoreProvider so
    // the bench can measure it against the default HDFS-backed map on
    // the stream-stream floors. MEASURED at sf0.1 (see PERF.md r14):
    // RocksDB lost on every stateful query at fixture scale — JNI +
    // per-batch snapshot overhead dwarfs the tiny state — so the
    // default stays; at cluster scale with state ≫ executor memory the
    // trade flips, which is a one-conf deployment decision, not a code
    // change.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = s.conf.getOption(provKey)
    if (sys.env.get("GRAFT_STREAM_ROCKSDB").contains("1"))
      s.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
    try {
      val name = s"graft_stream_${nameCounter.incrementAndGet()}"
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      q.processAllAvailable()
      val hook = lastProgressHook
      if (hook != null) q.recentProgress.foreach(hook)
      q.stop()
      s.table(name)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prev)
      prevProv match {
        case Some(p) => s.conf.set(provKey, p)
        case None => s.conf.unset(provKey)
      }
    }
  }

  private def tsStr(c: String): org.apache.spark.sql.Column =
    date_format(col(c), "yyyy-MM-dd HH:mm:ss")

  val queries: Seq[Q] = Seq(
    Q("stream_tumbling_1h",
      (s, d) => {
        val agg = eventsStream(s, d)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        runToMemory(agg, "complete")
          .select(tsStr("window.start").as("w_start"), col("event_type"), col("n"))
          .orderBy("w_start", "event_type")
      },
      // complete mode: the last micro-batch overwrite IS the full batch
      // aggregate, whatever the batch split — direct oracle (r13)
      Some("""SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
             |    '%Y-%m-%d %H:%M:%S') AS w_start,
             |  event_type, COUNT(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("stream_sliding",
      (s, d) => {
        val agg = eventsStream(s, d)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          // exact distinct is unsupported on streams — HLL sketch instead
          .agg(count(lit(1)).as("n"), approx_count_distinct(col("user_id")).as("n_users"))
        runToMemory(agg, "complete")
          .select(tsStr("window.start").as("w_start"), col("n"), col("n_users"))
          .orderBy("w_start")
      }, None),

    // Append mode: only sessions finalized by the watermark emit —
    // deterministic for a fixed fixture (Spark runs a no-data batch to
    // flush state once the watermark advances past session ends).
    Q("stream_session",
      (s, d) => {
        val agg = eventsStream(s, d)
          .withWatermark("ts", "10 minutes")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        runToMemory(agg, "append")
          .select(col("user_id"),
            tsStr("session_window.start").as("sess_start"),
            tsStr("session_window.end").as("sess_end"), col("n_events"))
          .orderBy("user_id", "sess_start")
      },
      // direct oracle (r13): the stream_session_catchup island device,
      // here returning the per-session rows themselves (start = first
      // event, end = last event + 30 min, finalized when end ≤ the
      // final watermark = max event time − 10 min)
      Some("""WITH e AS (SELECT user_id, ts FROM events),
             |wm AS (SELECT (epoch_ms(max(ts)) - 600000) * 1000 AS w FROM e),
             |b AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |           IS NULL
             |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |           >= INTERVAL 30 MINUTE
             |    THEN 1 ELSE 0 END AS brk
             |  FROM e),
             |g AS (
             |  SELECT user_id, ts,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM b),
             |sess AS (
             |  SELECT user_id, COUNT(*) AS n_events, min(ts) AS s_start,
             |    max(ts) + INTERVAL 30 MINUTE AS s_end
             |  FROM g GROUP BY user_id, sid)
             |SELECT user_id,
             |  strftime(s_start, '%Y-%m-%d %H:%M:%S') AS sess_start,
             |  strftime(s_end, '%Y-%m-%d %H:%M:%S') AS sess_end, n_events
             |FROM sess, wm WHERE epoch_us(s_end) <= w
             |ORDER BY user_id, sess_start""".stripMargin)),

    // Append-mode tumbling agg: late rows (older than watermark) are
    // dropped and unfinalized trailing windows withheld — the
    // watermark-semantics surface; StreamingSpec drives the controlled
    // late-row case with MemoryStream.
    Q("stream_late_data",
      (s, d) => {
        val agg = eventsStream(s, d)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n"))
        runToMemory(agg, "append")
          .select(tsStr("window.start").as("w_start"), col("n"))
          .orderBy("w_start")
      },
      // direct oracle (r13): stream_late_catchup's finalization device —
      // single staged file ⇒ one data batch ⇒ nothing is ever late, and
      // append emits exactly the windows whose end ≤ final watermark
      Some("""WITH wm AS (
             |  SELECT (epoch_ms(max(ts)) - 600000) * 1000 AS w FROM events),
             |b AS (
             |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, COUNT(*) AS n
             |  FROM events GROUP BY 1)
             |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, n
             |FROM b, wm WHERE epoch_us(ws + INTERVAL 1 HOUR) <= w
             |ORDER BY w_start""".stripMargin)),

    Q("stream_dedup",
      (s, d) => {
        val deduped = eventsStream(s, d)
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .select(col("event_id"), col("user_id"), col("event_type"))
        runToMemory(deduped, "append").orderBy("event_id")
      },
      // direct oracle (r13): event_id is unique in the fixture, so the
      // dedup must be a NO-OP — the oracle pins exactly-once delivery
      // and no-false-drops (real duplicate handling is pinned by
      // stream_dedup_catchup + StreamingSpec's MemoryStream case)
      Some("""SELECT event_id, user_id, event_type FROM events
             |ORDER BY event_id""".stripMargin)),

    // Stream-static join is stateless on the stream side; the static
    // dim would be broadcast on a cluster.
    Q("stream_static_join",
      (s, d) => {
        val cust = s.read.parquet(s"$d/customer.parquet")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        val joined = eventsStream(s, d)
          .join(cust, col("user_id") === col("c_custkey"))
          .select(col("event_id"), col("user_id"), col("c_name"), col("c_mktsegment"))
        runToMemory(joined, "append").orderBy("event_id")
      },
      // direct oracle (r13): stateless exactly-once append ⇒ the sink
      // is the batch inner join, whatever the micro-batch split
      Some("""SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |ORDER BY e.event_id""".stripMargin)),

    // Stream-stream interval join: both sides watermarked, join window
    // bounded to 1h → state eviction is safe on both sides.
    Q("stream_stream_join",
      (s, d) => {
        val purchases = eventsStream(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("p_id"))
          .withWatermark("p_ts", "1 hour")
        val clicks = eventsStream(s, d)
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("event_id").as("c_id"))
          .withWatermark("c_ts", "1 hour")
        val joined = purchases.join(clicks,
          col("p_user") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"))
          .select(col("p_id"), col("c_id"), col("p_user"))
        runToMemory(joined, "append").orderBy("p_id", "c_id")
      },
      // direct oracle (r13): inner stream-stream matches emit as found;
      // single staged file ⇒ both sides fully present in batch one ⇒
      // the sink is the complete batch interval join
      Some("""SELECT p.event_id AS p_id, c.event_id AS c_id,
             |  p.user_id AS p_user
             |FROM events p JOIN events c
             |  ON p.user_id = c.user_id
             | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
             |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
             |ORDER BY p_id, c_id""".stripMargin)),

    // LEFT OUTER stream-stream join: same watermarked interval join,
    // but purchases with NO preceding click in the hour still emit
    // (with null click columns) once the watermark passes their join
    // window — the attribution-with-fallout shape a pure inner join
    // cannot express. Outer emission is watermark-driven state
    // EVICTION: a row leaves the left buffer exactly once, so results
    // are exactly-once per purchase; StreamingSpec pins matched +
    // unmatched counts against the batch oracle computation.
    Q("stream_stream_outer",
      (s, d) => {
        val purchases = eventsStream(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("p_id"))
          .withWatermark("p_ts", "1 hour")
        val clicks = eventsStream(s, d)
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("event_id").as("c_id"))
          .withWatermark("c_ts", "1 hour")
        val joined = purchases.join(clicks,
          col("p_user") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"),
          "left_outer")
          .select(col("p_id"), col("c_id"), col("p_user"),
            col("c_id").isNull.as("unattributed"))
        runToMemory(joined, "append").orderBy("p_id", "c_id")
      },
      // direct oracle (r13): matches emit as found (both sides in batch
      // one); unmatched purchases null-emit on state EVICTION, which
      // happens once the final watermark — min(max purchase ts, max
      // click ts) − 1 h, ms-truncated — passes p_ts (the latest click
      // that could still match p has c_ts = p_ts). Purchases still open
      // at end-of-stream are withheld: production fallout semantics,
      // same rule as stream_outer_catchup.
      Some("""WITH p AS (
             |  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
             |  FROM events WHERE event_type = 'click'),
             |wm AS (
             |  SELECT (epoch_ms(LEAST((SELECT max(p_ts) FROM p),
             |    (SELECT max(c_ts) FROM c))) - 3600000) * 1000 AS w),
             |j AS (
             |  SELECT p.p_id, c.c_id, p.p_user, p.p_ts
             |  FROM p LEFT JOIN c ON p.p_user = c.c_user
             |    AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
             |    AND c.c_ts <= p.p_ts)
             |SELECT p_id, c_id, p_user, c_id IS NULL AS unattributed
             |FROM j, wm WHERE c_id IS NOT NULL OR epoch_us(p_ts) < wm.w
             |ORDER BY p_id, c_id""".stripMargin)),

    // Arbitrary stateful processing: running per-user event count kept
    // in GroupState; emits the updated count each batch (update mode).
    Q("stream_stateful_count",
      (s, d) => {
        implicit val longEnc = Encoders.scalaLong
        implicit val tupEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        val users: Dataset[Long] = eventsStream(s, d)
          .select(col("user_id")).as[Long](longEnc)
        val counted = users.groupByKey(identity)(longEnc)
          .flatMapGroupsWithState[Long, (Long, Long)](
            OutputMode.Update, GroupStateTimeout.NoTimeout) {
            (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
              val prev = state.getOption.getOrElse(0L)
              val next = prev + rows.size
              state.update(next)
              Iterator((user, next))
          }(longEnc, tupEnc)
          .toDF("user_id", "running_count")
        runToMemory(counted, "update").orderBy("user_id")
      },
      // direct oracle (r13): single staged file ⇒ one data batch ⇒ each
      // user emits exactly once, with its full count (the multi-batch
      // recovery variant is stream_fmgws_catchup's max-count device)
      Some("""SELECT user_id, COUNT(*) AS running_count
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Spark 4 transformWithState: typed ValueState in the RocksDB state
    // store (required provider for this API) — per-user running value
    // sum; the modern arbitrary-state surface alongside
    // flatMapGroupsWithState above.
    Q("stream_transformwithstate",
      (s, d) => {
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        implicit val longEnc = Encoders.scalaLong
        implicit val tupEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
        implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
        val pairs = eventsStream(s, d)
          .select(col("user_id"), col("value"))
          .as[(Long, Double)](inEnc)
        val out = pairs.groupByKey(_._1)(longEnc)
          .transformWithState(new RunningValueSum(),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())(tupEnc)
          .toDF("user_id", "running_value_sum")
          .withColumn("running_value_sum", round(col("running_value_sum"), 2))
        runToMemory(out, "update").orderBy("user_id")
      }, None),

    // The production batch-catchup shape: Trigger.AvailableNow with a
    // PERSISTENT checkpoint and a parquet sink. First invocation drains
    // the source and self-terminates; every later invocation replays
    // NOTHING (the checkpoint knows the files are processed) and the
    // sink still holds exactly one copy — so an aggregate over the sink
    // equals the batch aggregate over the source, which is the DuckDB
    // oracle. This is the one streaming query where an oracle is
    // semantically sound: exactly-once delivery makes the streaming
    // output bit-equal to batch. (The sink read honors the
    // _spark_metadata manifest, so partially-written files from an
    // interrupted run are invisible.)
    Q("stream_availablenow_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        // v3: keyed alongside the STABLE staged source path (a
        // checkpoint written against a since-deleted random staging dir
        // must not be resumed). Bumped v2→v3 when stageDir generalized
        // to per-table staging and the staged path changed — a v2
        // checkpoint's offset log records the OLD source path and must
        // not be resumed against the new one.
        val root = s"${sys.props("java.io.tmpdir")}/graft_avnow_v3_$key"
        val q = eventsStream(s, d)
          .select(col("event_id"), col("event_type"), col("value"))
          .writeStream.format("parquet")
          .option("path", s"$root/sink")
          .option("checkpointLocation", s"$root/cp")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
             |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Second ORACLED streaming query (stream_availablenow_catchup's
    // exactly-once argument, applied to stateful dedup): documents
    // stream through dropDuplicates keyed by (source, md5(text)) under
    // Trigger.AvailableNow into a persistent parquet sink — catch-up
    // processes the full backlog exactly once, and dedup state keyed
    // WITH the source makes the surviving row set batch-order-
    // independent (same text under two sources survives once per
    // source; which duplicate row wins within a key doesn't matter
    // because key collisions share text and n_chars by construction).
    // The batch twin is therefore a plain DISTINCT — a full DuckDB
    // oracle, raising the oracled streaming surface to two.
    Q("stream_dedup_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/documents.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_dedupnow_v1_$key"
        val q = documentsStream(s, d)
          .select(col("source"), md5(col("text")).as("h"),
            col("n_chars"))
          .dropDuplicates("source", "h")
          .writeStream.format("parquet")
          .option("path", s"$root/sink")
          .option("checkpointLocation", s"$root/cp")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink")
          .groupBy("source")
          .agg(count(lit(1)).as("n_unique"),
            sum("n_chars").cast("long").as("total_chars"))
          .orderBy("source")
      },
      Some("""WITH u AS (
             |  SELECT DISTINCT source, md5(text) AS h, n_chars
             |  FROM documents)
             |SELECT source, COUNT(*) AS n_unique,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM u GROUP BY source ORDER BY source""".stripMargin)),

    // Fifth ORACLED streaming query (r11, VERDICT #9): session windows
    // under Trigger.AvailableNow with a parquet sink. Append mode emits
    // ONLY sessions finalized by the final watermark (the no-data
    // catch-up batch sets wm = max event time − 10 min, ms-truncated —
    // Spark's event-time stats are millisecond-precision), so the
    // oracle is the BATCH sessionization (win_sessionize_batch's
    // island device, break at gap ≥ 30 min — Spark merges sessions
    // only on strict overlap, so an event exactly 30 min after its
    // predecessor starts a NEW session) filtered to sessions whose end
    // (last event + 30 min) ≤ that watermark. This pins the watermark
    // finalization semantics the memory-sink stream_session query
    // can't oracle. Exactly-once: single staged source file ⇒ one data
    // batch ⇒ no late-data drops; re-runs resume the checkpoint and
    // emit nothing new.
    Q("stream_session_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_sessnow_v1_$key"
        val q = eventsStream(s, d)
          .withWatermark("ts", "10 minutes")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("session_window.end").as("s_end"),
            col("n_events"))
          .writeStream.format("parquet")
          .option("path", s"$root/sink")
          .option("checkpointLocation", s"$root/cp")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum("n_events").cast("long").as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, ts FROM events),
             |wm AS (SELECT (epoch_ms(max(ts)) - 600000) * 1000 AS w FROM e),
             |b AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |           IS NULL
             |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |           >= INTERVAL 30 MINUTE
             |    THEN 1 ELSE 0 END AS brk
             |  FROM e),
             |g AS (
             |  SELECT user_id, ts,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM b),
             |sess AS (
             |  SELECT user_id, sid, COUNT(*) AS n,
             |    epoch_us(max(ts) + INTERVAL 30 MINUTE) AS s_end
             |  FROM g GROUP BY 1, 2)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
             |  CAST(SUM(n) AS BIGINT) AS n_events
             |FROM sess, wm WHERE s_end <= w
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Sixth ORACLED streaming query: SLIDING-window catchup. Complete
    // output mode keeps every window's state (no watermark eviction),
    // so after Trigger.AvailableNow drains the fixture the final
    // micro-batch overwrite IS the batch answer — the determinism
    // argument needs no finalization caveat, only the complete-mode
    // memory bound (window count is calendar-bounded: 4 overlapping
    // 1h/15min windows per event, ≤ 4 × hours-of-history rows of
    // state). The oracle materializes the same overlap explicitly:
    // each event belongs to EXACTLY the 4 slide-aligned windows
    // time_bucket(ts) − k·15min, k ∈ 0..3 — pinning Spark's
    // epoch-aligned window/slide semantics, not just the totals.
    Q("stream_sliding_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_slidenow_v1_$key"
        val agg = eventsStream(s, d)
          .withColumn("cents",
            (col("value").cast("decimal(18,2)") * 100).cast("long"))
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
        val q = agg.writeStream
          .outputMode("complete")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("overwrite").parquet(s"$root/sink")
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink")
          .select(tsStr("window.start").as("w_start"), col("n_events"),
            (col("cents").cast("double") / 100.0).as("total_value"))
          .orderBy("w_start")
      },
      Some("""WITH w AS (
             |  SELECT time_bucket(INTERVAL 15 MINUTE, ts)
             |      - (INTERVAL 15 MINUTE) * k AS w_start,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) ks)
             |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_value
             |FROM w GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Eighth ORACLED streaming query: TransformWithState (Spark 4's
    // arbitrary-state API) pinned against a batch aggregate. The
    // Update-mode processor emits a cumulative (count, cents) row per
    // key per micro-batch; count is STRICTLY MONOTONE per key, so the
    // per-key final state in the append sink is exactly the max-count
    // row — recoverable however AvailableNow split the batches — and
    // cents accumulate as exact longs, so the recovered totals must
    // equal the batch GROUP BY. This is the determinism argument the
    // Update-mode memory-sink variant (stream_transformwithstate)
    // cannot make, which is why that one is sanctioned no-oracle.
    Q("stream_tws_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_twsnow_v1_$key"
        // TransformWithState requires the RocksDB provider; the session
        // is SHARED across the whole bench/verify sweep, so capture the
        // prior value and restore it after the query terminates (r12
        // ADVICE) — otherwise every streaming query that runs later
        // silently inherits a different state-store provider depending
        // on execution order.
        val providerKey = "spark.sql.streaming.stateStore.providerClass"
        val priorProvider = s.conf.getOption(providerKey)
        s.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        implicit val longEnc = Encoders.scalaLong
        implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        implicit val outEnc = Encoders.tuple(Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong)
        val pairs = eventsStream(s, d)
          .select(col("user_id"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("cents"))
          .as[(Long, Long)](inEnc)
        val out = pairs.groupByKey(_._1)(longEnc)
          .transformWithState(new RunningCountCents(),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())(outEnc)
          .toDF("user_id", "n_events", "cents")
        try {
          val q = out.writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              batch.write.mode("append").parquet(s"$root/sink")
            }
            .option("checkpointLocation", s"$root/cp")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        } finally priorProvider match {
          case Some(v) => s.conf.set(providerKey, v)
          case None    => s.conf.unset(providerKey)
        }
        s.read.parquet(s"$root/sink")
          .groupBy("user_id")
          .agg(max("n_events").as("n_events"),
            max_by(col("cents"), col("n_events")).as("cents"))
          .select(col("user_id"), col("n_events"),
            (col("cents").cast("double") / 100.0).as("total_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
             |    AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Seventh ORACLED streaming query: STREAM-STREAM inner join under
    // Trigger.AvailableNow, pinned against the batch join. The
    // completeness argument: inner-join matches emit as soon as both
    // sides' rows are in state, and state is only evicted past the
    // watermark — so with a watermark delay LONGER than the fixture's
    // whole time span (40 days > 30), nothing is ever evicted and the
    // appended sink must equal the batch join EXACTLY. That bound is
    // the fixture-scale price of an oracle; a production job uses a
    // real delay and trades completeness at the margin for bounded
    // state (documented, same trade as stream_session_catchup's
    // finalized-only rows). Output folds the matched pairs to a
    // user-bucket rollup with exact decimal cents.
    Q("stream_join_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_joinnow_v2_$key"
        val src = eventsStream(s, d)
        val left = src
          .filter(col("event_id") % 2 === 0)
          .select(col("user_id"), col("ts").as("l_ts"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("l_cents"))
          .withWatermark("l_ts", "40 days")
        val right = src
          .filter(col("event_id") % 2 === 1)
          .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("r_cents"))
          .withWatermark("r_ts", "40 days")
        val joined = left.join(right,
          col("user_id") === col("r_user") &&
            col("r_ts") >= col("l_ts") &&
            col("r_ts") <= col("l_ts") + expr("INTERVAL 5 MINUTES"))
        // IDEMPOTENT sink (r12 ADVICE): foreachBatch is at-least-once,
        // so a batch REPLAYED after a mid-run failure (or a killed
        // re-run resuming this fixture-keyed checkpoint) must replace,
        // not duplicate — plain mode("append") to one directory would
        // permanently inflate n_pairs/sum_cents and fail the oracle on
        // every later run. Each batch overwrites its own batchId-named
        // subdirectory; the read globs them back together.
        val q = joined.writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.write.mode("overwrite").parquet(s"$root/sink/b=$batchId")
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink/b=*")
          .groupBy((col("user_id") % 10).as("user_bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("l_cents") + col("r_cents")).cast("long")
              .as("sum_cents"))
          .orderBy("user_bucket")
      },
      Some("""SELECT user_id % 10 AS user_bucket,
             |  COUNT(*) AS n_pairs,
             |  CAST(SUM(l_cents + r_cents) AS BIGINT) AS sum_cents
             |FROM (
             |  SELECT l.user_id,
             |    CAST(CAST(l.value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS l_cents,
             |    CAST(CAST(r.value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS r_cents
             |  FROM (SELECT * FROM events WHERE event_id % 2 = 0) l
             |  JOIN (SELECT * FROM events WHERE event_id % 2 = 1) r
             |    ON l.user_id = r.user_id
             |   AND r.ts >= l.ts
             |   AND r.ts <= l.ts + INTERVAL 5 MINUTE) j
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Third ORACLED streaming query: STATELESS stream-static broadcast
    // enrichment under Trigger.AvailableNow — the exactly-once argument
    // needs no state-finalization caveat at all here (no watermark, no
    // open windows: every input row maps to exactly one output row the
    // moment its batch commits), so the sink aggregate equals the batch
    // join by construction. This is the canonical streaming-ETL
    // enrichment shape (fact stream ⋈ broadcast dim at ingest); the
    // dim key derives a nation from user_id since the fixture stream
    // carries no FK.
    Q("stream_enrich_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_enrichnow_v1_$key"
        val dim = graft.Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))
        val q = eventsStream(s, d)
          .select(col("event_id"), col("user_id"), col("value"))
          .withColumn("nk", (col("user_id") % 25).cast("int"))
          .join(broadcast(dim), col("nk") === col("n_nationkey"))
          .select(col("event_id"), col("n_name"), col("value"))
          .writeStream.format("parquet")
          .option("path", s"$root/sink")
          .option("checkpointLocation", s"$root/cp")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink")
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("sum_value"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_value
             |FROM events e JOIN nation n
             |  ON CAST(e.user_id % 25 AS INT) = n.n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Fourth ORACLED streaming query — the "streaming dashboard table"
    // shape: a COMPLETE-mode stateful aggregation whose every
    // micro-batch OVERWRITES an idempotent parquet sink via
    // foreachBatch. Complete mode needs no watermark and re-emits all
    // groups each batch, so after the AvailableNow catch-up the sink
    // holds exactly the batch aggregate of the full fixture — the
    // exactly-once argument needs no open-window caveat (the reason
    // session/tumbling aggs stay no-oracle doesn't apply). Re-runs
    // with the existing checkpoint see no new files, emit no batch,
    // and leave the final state intact (idempotent). Scale: complete
    // mode re-emits |event_type| rows per batch — key-bounded, the
    // ONLY safe cardinality for this pattern; a high-cardinality key
    // belongs in append/update mode instead (documented trade).
    Q("stream_agg_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_aggnow_v1_$key"
        val agg = eventsStream(s, d)
          .withColumn("cents",
            (col("value").cast("decimal(18,2)") * 100).cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
        val q = agg.writeStream
          .outputMode("complete")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("overwrite").parquet(s"$root/sink")
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink")
          .select(col("event_type"), col("n_events"),
            (col("cents").cast("double") / 100.0).as("total_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             |    AS DOUBLE) / 100.0 AS total_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Ninth ORACLED streaming query (r12) — complete-mode EVENT-TIME
    // WINDOWED aggregation + post-rank: per UTC day, the top event
    // type by count (ties → lexicographic type). Complete mode over a
    // (day × type)-bounded key space re-emits the whole table per
    // micro-batch (same key-bounded-only caveat as stream_agg_catchup)
    // and needs no watermark, so the AvailableNow catch-up's final
    // overwrite equals the batch windowed aggregate EXACTLY — which is
    // what the oracle states. The rank runs on the SINK read-back
    // (day-bounded window) — the streaming side ships the raw
    // dashboard table, the serving layer ranks, the standard split.
    Q("stream_topn_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_topnnow_v1_$key"
        val agg = eventsStream(s, d)
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val q = agg.writeStream
          .outputMode("complete")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("overwrite").parquet(s"$root/sink")
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val w = org.apache.spark.sql.expressions.Window.partitionBy("day")
          .orderBy(col("n").desc, col("event_type"))
        s.read.parquet(s"$root/sink")
          .select(to_date(col("window.start")).cast("string").as("day"),
            col("event_type"), col("n"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("day"), col("event_type").as("top_type"), col("n"))
          .orderBy("day")
      },
      Some("""WITH c AS (
             |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             |    event_type, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |r AS (
             |  SELECT day, event_type, CAST(n AS BIGINT) AS n,
             |    ROW_NUMBER() OVER (PARTITION BY day
             |      ORDER BY n DESC, event_type) AS rn
             |  FROM c)
             |SELECT day, event_type AS top_type, n
             |FROM r WHERE rn = 1 ORDER BY day""".stripMargin)),

    // foreachBatch sink: every micro-batch lands as parquet; read the
    // result back — the batch-sink integration surface.
    // Tenth ORACLED streaming query (r13, verdict Next #7): APPEND-mode
    // tumbling windows with watermark FINALIZATION — the late-data
    // semantics surface stream_late_data exercises with a memory sink,
    // here pinned against DuckDB. Append emits a window only once the
    // watermark passes its END; the AvailableNow no-data catch-up batch
    // sets wm = max event time − 10 min (ms-truncated), so the oracle
    // is the batch tumbling aggregate filtered to windows whose end ≤
    // that watermark (the stream_session_catchup device, tumbling
    // form). Exactly-once: single staged source file ⇒ one data batch
    // ⇒ nothing is ever late; re-runs resume the checkpoint and emit
    // nothing new.
    Q("stream_late_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_latenow_v1_$key"
        val q = eventsStream(s, d)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n_events"),
            sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
              .as("cents"))
          .select(col("window.start").as("w_start_ts"), col("n_events"),
            col("cents"))
          .writeStream.format("parquet")
          .option("path", s"$root/sink")
          .option("checkpointLocation", s"$root/cp")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink")
          .select(date_format(col("w_start_ts"), "yyyy-MM-dd HH:mm:ss")
              .as("w_start"), col("n_events"),
            (col("cents").cast("double") / 100.0).as("total_value"))
          .orderBy("w_start")
      },
      Some("""WITH wm AS (
             |  SELECT (epoch_ms(max(ts)) - 600000) * 1000 AS w FROM events),
             |b AS (
             |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start,
             |    COUNT(*) AS n_events,
             |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) AS BIGINT) AS cents
             |  FROM events GROUP BY 1)
             |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
             |  n_events, CAST(cents AS DOUBLE) / 100.0 AS total_value
             |FROM b, wm WHERE epoch_us(w_start + INTERVAL 1 HOUR) <= w
             |ORDER BY w_start""".stripMargin)),

    // Eleventh ORACLED streaming query (r13): flatMapGroupsWithState —
    // the PRE-Spark-4 arbitrary-state API (stream_stateful_count's
    // shape) — pinned with the stream_tws_catchup recovery argument:
    // the Append-mode processor emits a cumulative (count, cents) row
    // per key per batch; count is STRICTLY MONOTONE per key, so the
    // per-key max-count row in the append sink is the final state
    // however AvailableNow split the batches, and exact long cents
    // make the recovered totals equal the batch GROUP BY.
    Q("stream_fmgws_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_fmgwsnow_v1_$key"
        implicit val longEnc = Encoders.scalaLong
        implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        implicit val stEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        implicit val outEnc = Encoders.tuple(Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong)
        val pairs = eventsStream(s, d)
          .select(col("user_id"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("cents"))
          .as[(Long, Long)](inEnc)
        val out = pairs.groupByKey(_._1)(longEnc)
          .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (user: Long, rows: Iterator[(Long, Long)],
             state: GroupState[(Long, Long)]) =>
              val (pn, pc) = state.getOption.getOrElse((0L, 0L))
              var n = pn; var c = pc
              rows.foreach { r => n += 1; c += r._2 }
              state.update((n, c))
              Iterator((user, n, c))
          }(stEnc, outEnc)
          .toDF("user_id", "n_events", "cents")
        val q = out.writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.write.mode("overwrite").parquet(s"$root/sink/b=$batchId")
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink/b=*")
          .groupBy("user_id")
          .agg(max("n_events").as("n_events"),
            max_by(col("cents"), col("n_events")).as("cents"))
          .select(col("user_id"), col("n_events"),
            (col("cents").cast("double") / 100.0).as("total_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
             |    AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Twelfth ORACLED streaming query (r13): LEFT-OUTER stream-stream
    // join under AvailableNow. Inner matches emit as found (single
    // staged file ⇒ both sides fully in state in batch one), and the
    // catch-up no-data batch advances the watermark to max event time
    // − 10 min, EVICTING unmatched left rows whose join window
    // [l_ts, l_ts + 5 min] has closed — each eviction emits the
    // null-extended row exactly once. The oracle states both halves in
    // batch terms: all matched pairs, plus unmatched purchases whose
    // window end precedes the final watermark (rows still open at
    // end-of-stream are withheld — the production attribution-fallout
    // semantics, not an artifact).
    Q("stream_outer_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_outernow_v1_$key"
        val src = eventsStream(s, d)
        val left = src.filter(col("event_id") % 2 === 0)
          .select(col("user_id"), col("ts").as("l_ts"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("l_cents"))
          .withWatermark("l_ts", "10 minutes")
        val right = src.filter(col("event_id") % 2 === 1)
          .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("r_cents"))
          .withWatermark("r_ts", "10 minutes")
        val joined = left.join(right,
          col("user_id") === col("r_user") &&
            col("r_ts") >= col("l_ts") &&
            col("r_ts") <= col("l_ts") + expr("INTERVAL 5 MINUTES"),
          "left_outer")
        val q = joined.writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.write.mode("overwrite").parquet(s"$root/sink/b=$batchId")
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$root/sink/b=*")
          .groupBy((col("user_id") % 10).as("user_bucket"))
          .agg(count(col("r_cents")).as("n_matched"),
            count(when(col("r_cents").isNull, lit(1))).as("n_unmatched"),
            sum(col("l_cents") + coalesce(col("r_cents"), lit(0L)))
              .cast("long").as("sum_cents"))
          .orderBy("user_bucket")
      },
      // wm = LEAST of the per-side maxima − 10 min: each withWatermark
      // node tracks ITS OWN input's max event time and the global
      // watermark is their MIN (multipleWatermarkPolicy default) — a
      // global max(ts) here overstates the watermark by the gap between
      // the two sides' maxima and mis-finalizes boundary rows (caught
      // by the r13 full sweep: one bucket-5 row at sf0.01)
      Some("""WITH wm AS (
             |  SELECT (epoch_ms(LEAST(
             |    (SELECT max(ts) FROM events WHERE event_id % 2 = 0),
             |    (SELECT max(ts) FROM events WHERE event_id % 2 = 1)))
             |    - 600000) * 1000 AS w),
             |l AS (SELECT user_id, ts AS l_ts,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS l_cents
             |  FROM events WHERE event_id % 2 = 0),
             |r AS (SELECT user_id AS r_user, ts AS r_ts,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS r_cents
             |  FROM events WHERE event_id % 2 = 1),
             |j AS (
             |  SELECT l.user_id, l.l_ts, l.l_cents, r.r_cents
             |  FROM l LEFT JOIN r
             |    ON l.user_id = r.r_user
             |   AND r.r_ts >= l.l_ts
             |   AND r.r_ts <= l.l_ts + INTERVAL 5 MINUTE),
             |fin AS (
             |  SELECT j.* FROM j, wm
             |  WHERE j.r_cents IS NOT NULL
             |     OR epoch_us(j.l_ts + INTERVAL 5 MINUTE) < wm.w)
             |SELECT user_id % 10 AS user_bucket,
             |  COUNT(r_cents) AS n_matched,
             |  COUNT(*) FILTER (WHERE r_cents IS NULL) AS n_unmatched,
             |  CAST(SUM(l_cents + COALESCE(r_cents, 0)) AS BIGINT)
             |    AS sum_cents
             |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Thirteenth ORACLED streaming query (r13): the MULTI-SINK
    // foreachBatch shape (the canonical reason foreachBatch exists —
    // one micro-batch fanned to several sinks atomically per batch id),
    // catch-up form: each batch writes BOTH a raw-rows sink and a
    // per-type delta-aggregate sink into batchId-named subdirectories
    // (idempotent under replay, the stream_join_catchup device). The
    // recovered per-type totals from EACH sink must independently
    // equal the batch aggregate — the oracle checks the joined view,
    // so a divergence in either sink fails the gate.
    Q("stream_multisink_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val f = new java.io.File(s"$d/events.parquet")
        val key = s"${d.replaceAll("[^A-Za-z0-9._-]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val root = s"${sys.props("java.io.tmpdir")}/graft_msinknow_v1_$key"
        val q = eventsStream(s, d)
          .select(col("event_id"), col("event_type"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("cents"))
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.persist()
            batch.write.mode("overwrite")
              .parquet(s"$root/raw/b=$batchId")
            batch.groupBy("event_type")
              .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
              .write.mode("overwrite")
              .parquet(s"$root/agg/b=$batchId")
            batch.unpersist()
            ()
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val fromRaw = s.read.parquet(s"$root/raw/b=*")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_raw"),
            sum("cents").cast("long").as("cents_raw"))
        val fromAgg = s.read.parquet(s"$root/agg/b=*")
          .groupBy("event_type")
          .agg(sum("n").cast("long").as("n_agg"),
            sum("cents").cast("long").as("cents_agg"))
        fromRaw.join(fromAgg, Seq("event_type"))
          .select(col("event_type"), col("n_raw"), col("n_agg"),
            (col("cents_raw").cast("double") / 100.0).as("value_raw"),
            (col("cents_agg").cast("double") / 100.0).as("value_agg"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  COUNT(*) AS n_raw, COUNT(*) AS n_agg,
             |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
             |    AS BIGINT)) AS DOUBLE) / 100.0 AS value_raw,
             |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
             |    AS BIGINT)) AS DOUBLE) / 100.0 AS value_agg
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    Q("stream_foreachbatch",
      (s, d) => {
        val outDir = java.nio.file.Files
          .createTempDirectory("graft_foreachbatch").toString
        val q = eventsStream(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(outDir)
          }
          .start()
        q.processAllAvailable()
        q.stop()
        s.read.parquet(outDir).orderBy("event_id")
      },
      // direct oracle (r13): stateless pass-through under exactly-once
      // foreachBatch append — the sink is the source, whatever the
      // batch split (no arithmetic, so `value` stays bit-identical)
      Some("""SELECT event_id, user_id, event_type, value FROM events
             |ORDER BY event_id""".stripMargin)),

    // Streaming ingest deduped against the PERSISTED band index — the
    // continuous-crawl architecture that joins this repo's two praised
    // halves: the standing corpus lives as bucketed band/set tables
    // (Dedup.writeBandIndex — no corpus-side shuffle on read-back,
    // DedupIndexSpec), and each arriving micro-batch of docs is checked
    // via foreachBatch → Dedup.incrementalNearDupsIndexed, appending
    // verdicts to the sink. Batch-vs-stream equivalence is the test
    // contract (StreamingSpec): the streamed verdicts must equal the
    // one-shot batch check on the same split — micro-batching must not
    // change dedup semantics (each batch is independent vs the index;
    // the fixture split mirrors llm_incremental_dedup's).
    Q("stream_dedup_index",
      (s, d) => {
        // per-JVM tmp database location — the dedup_index_incremental
        // pattern (a fixed cwd-relative warehouse dir outlives the
        // session's catalog metadata → LOCATION_ALREADY_EXISTS on the
        // next JVM)
        s.sql("CREATE DATABASE IF NOT EXISTS graft_stream_idx LOCATION " +
          s"'$streamIdxLocation'")
        // build the corpus index ONCE per fixture (the bandIndexMemo
        // convention of dedup_index_incremental — the standing index is
        // the artifact; only the arriving batches are per-run work).
        // Fingerprint via Llm.docsFingerprint (r13 ADVICE): it recurses
        // into the directory's part files, because a regenerated fixture
        // can keep identical top-level length/mtime while its parts
        // changed — the top-level-only key would serve a stale index.
        val fpNow = graft.operators.Llm.docsFingerprint(d)
        if (streamIdxMemo.get("graft_stream_idx.corpus") != fpNow) {
          val corpus = s.read.parquet(s"$d/documents.parquet")
            .filter(col("doc_id") % 10 >= 2)
          graft.api.Dedup.writeBandIndex(corpus, "doc_id", "text",
            table = "graft_stream_idx.corpus")
          streamIdxMemo.put("graft_stream_idx.corpus", fpNow)
        }
        val outDir = java.nio.file.Files
          .createTempDirectory("graft_stream_dedup").toString
        val q = documentsStream(s, d)
          .filter(col("doc_id") % 10 < 2)
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            graft.api.Dedup
              .incrementalNearDupsIndexed(batch, "doc_id", "text",
                "graft_stream_idx.corpus")
              .write.mode("append").parquet(outDir)
          }
          .start()
        q.processAllAvailable()
        q.stop()
        s.read.parquet(outDir).orderBy("doc_id")
      },
      // direct oracle (r13): each arriving doc's verdict is computed
      // against the SAME frozen corpus index independently of its
      // batch, so the streamed union equals the one-shot batch check —
      // byte-identical to llm_incremental_dedup/dedup_index_incremental
      // (same split, same k/bands/threshold), hence the same oracle
      Some(graft.operators.Llm.SQL_INCREMENTAL)),

    // Streaming EMBEDDING ingest committed to the persisted IVF index —
    // the ANN twin of stream_dedup_index, joining the repo's streaming
    // and similarity halves: the index is trained+written ONCE on the
    // standing corpus (vec_id % 3 ≠ 0, frozen codebook), then each
    // arriving micro-batch of new embeddings assigns against that
    // frozen codebook and APPENDS its postings (foreachBatch →
    // Similarity.appendToIvfIndex — O(batch), no retraining, bucket
    // files append-only). The declared result is the retrain-decision
    // audit over the grown artifact (Similarity.ivfIndexDrift): the
    // artifact holds exactly ALL vectors assigned to frozen cells
    // whatever the batch split — each append is batch-independent —
    // so the oracle is ann_index_drift's, verbatim (StreamingSpec pins
    // stream-grown ≡ batch-grown row-for-row).
    Q("stream_ann_append",
      (s, d) => {
        val f = new java.io.File(s"$d/embeddings.parquet")
        val tkey = s"${d.replaceAll("[^A-Za-z0-9_]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val table = s"graft_stream_idx.annstream_$tkey"
        s.sql("CREATE DATABASE IF NOT EXISTS graft_stream_idx LOCATION " +
          s"'$streamIdxLocation'")
        val cb = streamAnnMemo.computeIfAbsent(tkey, _ => {
          val cb0 = graft.api.Similarity.writeIvfIndex(
            graft.Tables.embeddings(s, d).filter(col("vec_id") % 3 =!= 0),
            "vec_id", "embedding", table, 16,
            graft.operators.DataOps.ORACLE_ITERS)
          val q = embeddingsStream(s, d)
            .filter(col("vec_id") % 3 === 0)
            .writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              graft.api.Similarity.appendToIvfIndex(
                batch, "vec_id", "embedding", table, cb0)
            }
            .start()
          q.processAllAvailable()
          q.stop()
          cb0
        })
        graft.api.Similarity.ivfIndexDrift(s, table, cb)
          .select(col("cell").cast("long").as("cell"), col("n_vecs"),
            col("fill_factor"), col("drift"))
          .orderBy("cell")
      },
      Some(graft.operators.DataOps.annDriftOracleSql)),

    // Streaming delivery into the CODED index (r16 — the coded twin of
    // stream_ann_append, closing the PQ lifecycle's ingest leg: a
    // continuous pipeline ingests into the artifact it SERVES from,
    // which since the coded index landed is the PQ one). The coded
    // index is trained + written ONCE on the standing cohort (vec_id
    // % 3 ≠ 0 — frozen coarse AND PQ codebooks), then each arriving
    // micro-batch of embeddings is assigned + residual-encoded against
    // those frozen codebooks and APPENDS its (id, cell, codes) rows
    // (foreachBatch → Similarity.appendToIvfPqIndex — O(batch), bucket
    // files append-only, bucket count resolved from the table's own
    // catalog spec, NO raw vectors stored). The declared result is the
    // coded drift/fill audit over the stream-grown artifact
    // (DataOps.ivfPqDriftAudit). Appends are batch-independent — every
    // delivery row is encoded against the same frozen codebooks
    // whatever micro-batch carried it — so the stream-grown artifact's
    // content equals the batch-grown one's and the oracle is
    // ann_ivfpq_drift's VERBATIM (StreamingSpec pins stream-grown ≡
    // batch-grown row-for-row).
    Q("stream_ivfpq_append",
      (s, d) => {
        val f = new java.io.File(s"$d/embeddings.parquet")
        val tkey = s"${d.replaceAll("[^A-Za-z0-9_]", "_")}_${graft.Fixtures.fingerprint(f)}"
        val table = s"graft_stream_idx.pqstream_$tkey"
        s.sql("CREATE DATABASE IF NOT EXISTS graft_stream_idx LOCATION " +
          s"'$streamIdxLocation'")
        streamPqMemo.computeIfAbsent(tkey, _ => {
          val model = graft.api.Similarity.writeIvfPqIndex(
            graft.Tables.embeddings(s, d).filter(col("vec_id") % 3 =!= 0),
            "vec_id", "embedding", table, 16, 4, 16,
            graft.operators.DataOps.ORACLE_ITERS)
          val q = embeddingsStream(s, d)
            .filter(col("vec_id") % 3 === 0)
            .writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              graft.api.Similarity.appendToIvfPqIndex(
                batch, "vec_id", "embedding", table, model._1, model._2)
            }
            .start()
          q.processAllAvailable()
          q.stop()
          model
        })
        graft.operators.DataOps.ivfPqDriftAudit(s, table)
      },
      Some(graft.operators.DataOps.ivfPqDriftOracleSql)),

    // Streaming deliveries → fragmented band index → COMPACTION — the
    // maintenance leg under the INGEST path (r14, tying this round's
    // dedup_index_compact into streaming): three AvailableNow runs
    // model three scheduled ingest deliveries, each appending its
    // micro-batches' postings to BOTH halves of the artifact
    // (foreachBatch → Dedup.appendToBandIndex — exactly the
    // fragmentation a continuously-fed index accrues), then
    // Dedup.compactBandIndex rewrites each half one-file-per-bucket
    // under its original catalog spec. The declared result is the
    // content-preservation audit; the corpus content (doc_id % 10 >=
    // 2) is delivery-path-invariant, so the oracle is
    // dedup_index_compact's verbatim, and StreamingSpec pins the
    // stream-built artifact's audit ≡ the batch-built one's.
    Q("stream_compact_catchup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        s.sql("CREATE DATABASE IF NOT EXISTS graft_stream_idx LOCATION " +
          s"'$streamIdxLocation'")
        val fpNow = graft.operators.Llm.docsFingerprint(d)
        val src = "graft_stream_idx.cmpsrc"
        val dst = "graft_stream_idx.cmpdst"
        if (streamIdxMemo.get(dst) != fpNow) {
          Seq("_bands", "_sets").foreach { sfx =>
            s.sql(s"DROP TABLE IF EXISTS $src$sfx")
            s.sql(s"DROP TABLE IF EXISTS $dst$sfx")
          }
          Seq(Seq(2L, 3L, 4L), Seq(5L, 6L, 7L), Seq(8L, 9L)).foreach { del =>
            val cp = java.nio.file.Files
              .createTempDirectory("graft_stream_cmp").toString
            val q = documentsStream(s, d)
              .filter((col("doc_id") % 10).isin(del: _*))
              .writeStream
              .foreachBatch { (batch: DataFrame, _: Long) =>
                if (!batch.isEmpty)
                  graft.api.Dedup.appendToBandIndex(
                    batch, "doc_id", "text", src)
              }
              .option("checkpointLocation", cp)
              .trigger(Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          graft.api.Dedup.compactBandIndex(s, src, dst)
          streamIdxMemo.put(dst, fpNow)
        }
        graft.operators.Llm.bandIndexAudit(s, dst)
      },
      Some(graft.operators.Llm.SQL_BAND_AUDIT))
  )
}
