package graft.api

import graft.functions.TextUdfs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Public deduplication API over arbitrary document DataFrames.
  *
  * All operators are linear-pass + key-shuffle shapes (no all-pairs
  * work): exact dedup shuffles on a content hash; minhash/LSH shuffles
  * on doc id then band hash; SimHash is one grouped pass. Hashes are
  * md5-of-string on purpose — portable across engines and stable across
  * runs, so results are reproducible cluster-wide.
  */
object Dedup {

  /** Duplicate-content groups: one row per distinct content hash with
    * the canonical (minimum) id and the group size.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("md5_hex"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_docs"))

  /** Rows surviving exact dedup (the minimum id per content group). */
  def exactKeep(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** One row per (id, 3-token shingle) occurrence. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextUdfs.tokenizeCol(col(textCol)).as("__t"))
      .select(col("doc_id"), explode(TextUdfs.shinglesFromTokens(col("__t"))).as("token"))

  /** k portable minhash signatures per doc (columns sig_0..sig_{k-1}).
    *
    * Signatures are LONGS (the first 15 hex nibbles of the md5, via
    * conv): min(long) is hash-aggregable, so the shingle stream gets a
    * partial HashAggregate instead of the per-partition Sort that
    * min(string) forces (SortAggregate) — the difference between a
    * linear pass and a sort at 100 TB. DuckDB mirrors the value with a
    * strpos polynomial over the same 15 nibbles.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16): DataFrame =
    signaturesFromShingles(shingleRows(docs, idCol, textCol), k)

  private def signaturesFromShingles(shingles: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(conv(substring(md5(concat(lit(i.toString), col("token"))), 1, 15), 16, 10)
        .cast("long")).as(s"sig_$i"))
    shingles.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding of the signatures → (doc_id, band, bhash). */
  def lshBanded(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4): DataFrame =
    bandedFromShingles(shingleRows(docs, idCol, textCol), k, bands)

  private def bandedFromShingles(shingles: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rows).map(r => col(s"sig_${b * rows + r}").cast("string")): _*))
    }
    signaturesFromShingles(shingles, k)
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bhash")))
  }

  /** Near-dup candidate pairs (doc_a < doc_b) by grouping per LSH
    * bucket and expanding pairs from the collected id list. Versus a
    * banded self-join this computes the shingle→minhash pipeline ONCE
    * (Spark does not reuse the exchange across self-join sides —
    * measured: the whole signature subtree ran twice) and turns the
    * join into a groupBy whose state is one id list per bucket.
    *
    * `maxBucket` caps the per-bucket list: buckets larger than the cap
    * contribute only their first `maxBucket` (sorted) ids — an explicit
    * skew guard for pathological corpora; with shingle-based signatures
    * real buckets stay in the single digits.
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, maxBucket: Int = 1000): DataFrame =
    pairsFromShingles(shingleRows(docs, idCol, textCol), k, bands, maxBucket)

  private def pairsFromShingles(shingles: DataFrame, k: Int, bands: Int,
      maxBucket: Int): DataFrame =
    bandedFromShingles(shingles, k, bands)
      .groupBy("band", "bhash")
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, maxBucket).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))"))
        .as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()

  /** Exact shingle-set Jaccard for the candidate pairs, with a
    * near-dup flag at `threshold`.
    *
    * Shape: one pass collects the distinct-shingle SET per doc
    * (ObjectHashAggregate — no sort), candidate pairs join that set
    * table twice, and the intersection is computed per pair with
    * array_intersect. Versus a token-level pair⋈token⋈token join this
    * touches |pairs| rows instead of Σ|pair shingles| and avoids
    * re-deriving the shingle stream three more times.
    */
  def jaccardVerify(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, k: Int = 16, bands: Int = 4): DataFrame =
    jaccardFromShingles(persistedShingles(docs, idCol, textCol),
      threshold, k, bands)

  /** The tokenize+shingle explode of the whole corpus feeds BOTH the
    * per-doc set branch and the minhash→LSH pair branch; Spark does
    * not share the subtree across the two (the partial aggregates
    * differ, so no exchange reuse). persist() materializes it once —
    * and because persist registers with the session CacheManager by
    * canonicalized plan, later queries over the same corpus (the
    * pipeline + components queries) reuse the same cached shingles.
    * The cache lives until [[nearDupComponents]] (the terminal stage of
    * the dedup pipeline) unpersists it; callers using [[jaccardVerify]]
    * standalone on many distinct corpora should release it themselves
    * via `df.sparkSession.catalog.clearCache()` or a matching
    * `shingleRows(...).unpersist()`.
    */
  private def persistedShingles(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    shingleRows(docs, idCol, textCol).persist(StorageLevel.MEMORY_AND_DISK)

  private def jaccardFromShingles(shingles: DataFrame, threshold: Double,
      k: Int, bands: Int): DataFrame = {
    val sets = shingles
      .groupBy("doc_id").agg(collect_set(col("token")).as("toks"))
    val pairs = pairsFromShingles(shingles, k, bands, 1000)
    val nInter = size(array_intersect(col("sa.toks"), col("sb.toks")))
    val denom = size(col("sa.toks")) + size(col("sb.toks")) - nInter
    pairs
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(nInter.cast("double") / denom, 4).as("jaccard"),
        (nInter.cast("double") / denom >= threshold).as("is_near_dup"))
  }

  /** Connected components over the verified near-duplicate graph:
    * every doc appearing in a near-dup pair gets the MINIMUM doc id
    * reachable from it (its canonical representative). Iterative
    * min-label propagation — each round joins labels to the undirected
    * edge list and keeps the per-node min; converges in O(component
    * diameter) rounds (near-dup components are clique-ish, so 2-3).
    *
    * Convergence is detected from sum(comp) over the freshly
    * materialized labels: min-label propagation only ever DECREASES a
    * label, so the sum is strictly monotone until the fixpoint — an
    * O(|labels|) scan of the just-checkpointed rows instead of the
    * join+filter+isEmpty job a change-set diff would cost per round.
    *
    * `localCheckpoint` truncates the growing lineage each round. It is
    * NOT fault-tolerant (executor loss forfeits the run — the driver
    * cannot recompute truncated lineage); this trade is deliberate
    * here, a production cluster run that must survive executor churn
    * should substitute reliable `checkpoint` with an HDFS checkpoint
    * dir — same loop, same shape, one config.
    *
    * Requires a NUMERIC `idCol` (the convergence check sums labels; doc
    * ids in this engine are longs). The sum runs in DECIMAL(38,0), so
    * it cannot overflow under ANSI mode even for 10^19-scale id domains
    * (38 digits of headroom over any realistic corpus).
    */
  def nearDupComponents(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, k: Int = 16, bands: Int = 4,
      maxIters: Int = 25): DataFrame = {
    val shingles = persistedShingles(docs, idCol, textCol)
    val pairs = jaccardFromShingles(shingles, threshold, k, bands)
      .filter(col("is_near_dup"))
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .localCheckpoint() // eager — the shingle cache is consumed here
    // The pipeline is done with the shingle stream once the edge list is
    // materialized; release the cache (blocking=false: lazy eviction).
    shingles.unpersist(blocking = false)
    var labels = edges.select(col("u").as("doc")).distinct()
      .withColumn("comp", col("doc"))
      .localCheckpoint()
    def labelSum(df: DataFrame): BigDecimal = {
      val r = df.agg(sum(col("comp").cast("decimal(38,0)"))).head
      if (r.isNullAt(0)) BigDecimal(0) else BigDecimal(r.getDecimal(0))
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val propagated = labels.join(edges, col("doc") === col("u"))
        .select(col("v").as("doc"), col("comp"))
      val next = labels.unionByName(propagated)
        .groupBy("doc").agg(min("comp").as("comp"))
        .localCheckpoint() // eager: the round's one real job
      // cheap scan of the checkpointed rows, no join
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      iter += 1
    }
    labels
  }

  /** 32-bit SimHash fingerprint per doc from portable md5 nibble bits. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val shingled = shingleRows(docs, idCol, textCol).withColumn("h", md5(col("token")))
    def bitVote(k: Int): Column = expr(
      s"CASE WHEN shiftright((instr('0123456789abcdef', substr(h, ${k / 4 + 1}, 1)) - 1), ${k % 4}) % 2 = 1 THEN 1 ELSE -1 END")
    val bitAggs = (0 until 32).map(k => sum(bitVote(k)).as(s"s_$k"))
    val sums = shingled.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val packed = (0 until 32).map(k =>
      when(col(s"s_$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("doc_id"), packed.as("simhash"))
  }
}
