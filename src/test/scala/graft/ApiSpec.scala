package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public graft.api surface driven with user-constructed frames
  * (arbitrary column names — nothing fixture-specific).
  */
class ApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 10
      (12L, "the quick brown fox jumps over the lazy dog near the river bend today"), // near dup
      (13L, "completely different content about spark catalyst optimizer internals here"),
      (14L, "another unrelated text mentioning parquet files and shuffle partitions")
    ).toDF("id", "body")
  }

  test("Dedup.exactGroups + exactKeep collapse exact duplicates") {
    val groups = graft.api.Dedup.exactGroups(docs, "id", "body")
    assert(groups.count() == 4)
    assert(groups.filter(col("n_docs") === 2).select("keep_doc_id")
      .head.getLong(0) == 10L)
    val kept = graft.api.Dedup.exactKeep(docs, "id", "body")
    assert(kept.count() == 4)
    assert(kept.filter(col("id") === 11L).count() == 0)
  }

  test("Dedup.lshCandidatePairs surfaces the near-duplicate pair") {
    val pairs = graft.api.Dedup.lshCandidatePairs(docs, "id", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L))) // exact dups always collide
    assert(pairs.contains((10L, 12L)) || pairs.contains((11L, 12L)),
      s"near-dup not found in $pairs")
    assert(!pairs.exists(p => p._1 == 13L || p._2 == 13L))
  }

  test("Dedup.jaccardVerify: exact dup = 1.0, unrelated absent") {
    val j = graft.api.Dedup.jaccardVerify(docs, "id", "body", threshold = 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((10L, 11L)) == 1.0)
  }

  test("Dedup.incrementalNearDups flags a new exact dup, passes fresh content") {
    // treat ids >= 13 as the "new batch": 13/14 are unrelated to the
    // old corpus (10-12); add 15 = exact copy of old doc 10 — it must
    // flag is_dup with max_jaccard 1.0; 13/14 must appear with zero
    // candidates and is_dup false (the left-join contract)
    import spark.implicits._
    val withCopy = docs.union(Seq(
      (15L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("id", "body"))
    val out = graft.api.Dedup
      .incrementalNearDups(withCopy, "id", "body", col("id") >= 13)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out.keySet == Set(13L, 14L, 15L))
    assert(out(15L)._2 == 1.0 && out(15L)._3, s"exact copy not flagged: $out")
    assert(out(13L) == ((0L, 0.0, false)) && out(14L) == ((0L, 0.0, false)),
      s"fresh docs must pass with zero candidates: $out")
    graft.api.Dedup.releaseCaches(withCopy, "id", "body")
  }

  test("Dedup.incrementalNearDups edges: empty new batch; all-new corpus") {
    // no new rows -> empty result (not an error); all rows new -> every
    // doc present with zero candidates (nothing old to collide with)
    val none = graft.api.Dedup
      .incrementalNearDups(docs, "id", "body", lit(false))
    assert(none.count() == 0)
    val all = graft.api.Dedup
      .incrementalNearDups(docs, "id", "body", lit(true))
      .collect()
    assert(all.length == 5)
    assert(all.forall(r => r.getLong(1) == 0L && !r.getBoolean(3)))
    graft.api.Dedup.releaseCaches(docs, "id", "body")
  }

  test("Dedup.simhash: identical docs identical, near-dups close in hamming") {
    val h = graft.api.Dedup.simhash(docs, "id", "body")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(10L) == h(11L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(10L), h(12L)) < hamming(h(10L), h(13L)),
      s"near-dup not closer: ${h.toSeq.sorted}")
  }

  test("Dedup APIs survive an empty corpus and a no-near-dup corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "body")
    assert(graft.api.Dedup.exactGroups(empty, "id", "body").count() == 0)
    assert(graft.api.Dedup.minhashSignatures(empty, "id", "body").count() == 0)
    assert(graft.api.Dedup.lshCandidatePairs(empty, "id", "body").count() == 0)
    assert(graft.api.Dedup.jaccardVerify(empty, "id", "body").count() == 0)
    // empty edge set → fixpoint loop must converge immediately, not spin
    assert(graft.api.Dedup.nearDupComponents(empty, "id", "body").count() == 0)
    val distinctDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")).toDF("id", "body")
    assert(graft.api.Dedup.nearDupComponents(distinctDocs, "id", "body").count() == 0)
  }

  test("components finds multi-hop chains (a~b, b~c, a!~c → one component)") {
    import spark.implicits._
    // 40-token docs (38 shingles). b changes tokens 30-35 vs a, c
    // changes tokens 5-10 vs b: each hop kills 8 shingles → exact
    // J(a,b) = J(b,c) = 30/46 ≈ 0.652 ≥ 0.6, while a↔c differ in both
    // blocks → J(a,c) = 22/54 ≈ 0.41 < 0.6. Only transitivity links a
    // to c. bands=8 (2 sig rows/band) keeps the LSH candidate
    // probability at J≈0.65 near 1 (1-(1-0.65²)⁸ ≈ 0.99) — and the
    // exact Jaccard verify step makes the ≥0.6 decision non-probabilistic.
    // letter-only tokens: the tokenizer strips digits, so "tok1" would
    // collapse every position to the same token
    def w(prefix: String, i: Int) =
      s"$prefix${('a' + i % 26).toChar}${('a' + i / 26).toChar}"
    def doc(mods: Map[Int, String]) =
      (1 to 40).map(i => mods.getOrElse(i, w("tok", i))).mkString(" ")
    val bMods = (30 to 35).map(i => i -> w("chg", i)).toMap
    val cMods = bMods ++ (5 to 10).map(i => i -> w("alt", i)).toMap
    val chain = Seq(
      (1L, doc(Map.empty)), (2L, doc(bMods)), (3L, doc(cMods))).toDF("id", "body")
    val comp = graft.api.Dedup
      .nearDupComponents(chain, "id", "body", threshold = 0.6, bands = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 3 && comp.values.toSet == Set(1L),
      s"expected one component labeled 1, got $comp")
  }

  test("Similarity.bruteForceTopK ranks an identical vector first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to query
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (3L, Array(0.9f, 0.1f, 0.0f))
    ).toDF("vid", "emb")
    val top = graft.api.Similarity.bruteForceTopK(vecs, "vid", "emb", queryId = 0, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.head._1 == 1L && math.abs(top.head._2 - 1.0) < 1e-9)
    assert(top.last._1 == 2L && math.abs(top.last._2) < 1e-9)
  }

  test("observe() metrics ride along a curation query (pipeline observability)") {
    // the ops surface a 100 TB pipeline needs: row/token counters
    // collected DURING the real pass (no second scan), pulled from the
    // observation after the action completes
    // Observation registers a listener, so the metrics arrive no
    // matter which ACTION executes the plan (count() runs its own
    // QueryExecution — reading observedMetrics off the handle misses)
    val obs = org.apache.spark.sql.Observation("curation_metrics")
    val observed = docs.observe(obs,
      count(lit(1)).as("rows_seen"),
      sum(length(col("body"))).as("chars_seen"))
    val out = graft.api.Dedup.exactKeep(observed, "id", "body")
    assert(out.count() == 4)
    val row = obs.get
    assert(row("rows_seen") == 5L)
    assert(row("chars_seen").asInstanceOf[Long] > 0L)
  }

  test("TextMetrics.quality adds the metric columns, preserves rows") {
    val q = graft.api.TextMetrics.quality(docs, "id", "body")
    assert(q.count() == 5)
    assert(Seq("n_words", "avg_word_len", "stopword_ratio", "quality")
      .forall(q.columns.contains))
    assert(q.select(min(col("quality"))).head.getDouble(0) >= 0.0)
    assert(q.select(max(col("quality"))).head.getDouble(0) <= 1.0)
  }

  test("Dedup.dropBoilerplateLines drops cross-doc lines, keeps doc set intact") {
    import spark.implicits._
    // "lines" of 2 words; "nav bar" occurs in 3 docs (> maxDocs=2) →
    // boilerplate; "unique words" occurs once → kept.
    val corpus = Seq(
      (1L, "nav bar alpha beta"),
      (2L, "nav bar gamma delta"),
      (3L, "nav bar epsilon zeta"),
      (4L, "unique words only here")
    ).toDF("id", "body")
    val out = graft.api.Dedup
      .dropBoilerplateLines(corpus, "id", "body", lineWords = 2, maxDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 4) // every doc survives, even if fully boilerplate
    val d1 = out(0)
    assert(d1.getAs[Long]("n_lines") == 2 && d1.getAs[Long]("n_kept") == 1)
    assert(d1.getAs[String]("kept_text") == "alpha beta")
    assert(out(3).getAs[Long]("n_kept") == 2)
    assert(out(3).getAs[String]("kept_text") == "unique words only here")
    // a doc that is ALL boilerplate keeps its row with empty text
    val all = graft.api.Dedup
      .dropBoilerplateLines(corpus, "id", "body", lineWords = 2, maxDocs = 0)
      .orderBy("doc_id").collect()
    assert(all.forall(_.getAs[Long]("n_kept") == 0L))
    assert(all.forall(_.getAs[String]("kept_text") == ""))
  }

  test("Dedup.exactSubstringSpans: interval union, not per-gram double counting") {
    import spark.implicits._
    // A and B share the verbatim 6-token run "p q r s t u" → two
    // OVERLAPPING 5-grams each; the union must cover 6 tokens, not 10.
    val corpus = Seq(
      (1L, "p q r s t u aa bb cc"),            // 9 tokens, shared run at 1-6
      (2L, "x y z p q r s t u w"),             // 10 tokens, shared run at 4-9
      (3L, "completely unrelated words here live quietly") // no shared span
    ).toDF("id", "body")
    val out = graft.api.Dedup
      .exactSubstringSpans(corpus, "id", "body", spanTokens = 5, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("dup_tokens")).toSeq == Seq(6L, 6L, 0L))
    assert(out(0).getAs[Double]("dup_ratio") == 0.6667)
    assert(out(0).getAs[Boolean]("dup_heavy") && out(1).getAs[Boolean]("dup_heavy"))
    assert(!out(2).getAs[Boolean]("dup_heavy"))
    // docs shorter than the span survive with zero coverage (no grams)
    val short = Seq((1L, "one two"), (2L, "one two")).toDF("id", "body")
    val s = graft.api.Dedup
      .exactSubstringSpans(short, "id", "body", spanTokens = 5, minDocs = 2)
      .collect()
    assert(s.length == 2 && s.forall(_.getAs[Long]("dup_tokens") == 0L))
  }

  test("TextMetrics.normalize: NFC composes, control stripped, whitespace collapsed") {
    import spark.implicits._
    val dirty = Seq(
      (1L, "Cafe\u0301 \t hello \u0007  world  "), // decomposed e+U+0301, tab, BEL, runs
      (2L, "already clean")
    ).toDF("id", "raw")
    val out = graft.api.TextMetrics.normalize(dirty, "raw")
      .orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getAs[String]("norm_text") == "Café hello world")
    assert(r1.getAs[Long]("nfc_delta") == 1L)    // e+combining → é
    assert(r1.getAs[Long]("ctrl_removed") == 2L) // tab + BEL
    assert(r1.getAs[Boolean]("changed"))
    val r2 = out(1)
    assert(r2.getAs[String]("norm_text") == "already clean")
    assert(r2.getAs[Long]("nfc_delta") == 0L &&
      r2.getAs[Long]("ctrl_removed") == 0L && r2.getAs[Long]("ws_removed") == 0L)
    assert(!r2.getAs[Boolean]("changed"))
  }

  test("TextMetrics.fingerprint (within-row HOF) equals the explode+groupBy form") {
    val hof = graft.api.TextMetrics.fingerprint(docs, "id", "body")
      .orderBy("id").collect().toSeq
    val exploded = docs
      .select(col("id"),
        regexp_replace(lower(col("body")), "[^a-z]", "").as("cleaned"))
      .select(col("id"), explode(expr(
        "transform(sequence(1, greatest(length(cleaned) - 7, 1)), i -> substr(cleaned, i, 8))"))
        .as("gram"))
      .groupBy("id")
      .agg(min(md5(col("gram"))).as("fingerprint"),
        countDistinct(col("gram")).as("n_distinct_grams"))
      .orderBy("id").collect().toSeq
    assert(hof == exploded)
  }

  test("TextMetrics.chunkDocuments: overlap, coverage, final short chunk") {
    import spark.implicits._
    // 25 letter-only tokens (tokenizer-stable), chunk=10, stride=7 →
    // starts 0,7,14,21 → lengths 10,10,10,4
    val one = Seq((1L, (1 to 25).map(i =>
      s"${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar}x").mkString(" ")))
      .toDF("id", "body")
    val chunks = graft.api.TextMetrics
      .chunkDocuments(one, "id", "body", chunkTokens = 10, stride = 7)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getAs[Long]("chunk_idx")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(chunks.map(_.getAs[Long]("n_tokens")).toSeq == Seq(10L, 10L, 10L, 4L))
    // consecutive chunks overlap by chunk-stride = 3 tokens
    val t0 = chunks(0).getAs[String]("chunk_text").split(" ")
    val t1 = chunks(1).getAs[String]("chunk_text").split(" ")
    assert(t0.takeRight(3).sameElements(t1.take(3)))
    // every token of the doc appears in some chunk, in order
    val reassembled = chunks.flatMap(r =>
      r.getAs[String]("chunk_text").split(" ").take(7)).take(25)
    assert(reassembled.length == 25)
    intercept[IllegalArgumentException] {
      graft.api.TextMetrics.chunkDocuments(one, "id", "body", 5, 10)
    }
  }

  test("TextMetrics.hashedLinearScore: mean of bucket weights, stable labels") {
    import spark.implicits._
    // one-bucket weight vector → every token scores the same weight,
    // so the mean is that weight exactly, label follows its sign
    val one = Seq((1L, "alpha beta gamma"), (2L, "delta")).toDF("id", "body")
    val pos = graft.api.TextMetrics.hashedLinearScore(one, "id", "body", Seq(0.5))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(pos(1L) == (0.5, true) && pos(2L) == (0.5, true))
    val neg = graft.api.TextMetrics.hashedLinearScore(one, "id", "body", Seq(-0.25))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(neg(1L) == (-0.25, false))
    intercept[IllegalArgumentException] {
      graft.api.TextMetrics.hashedLinearScore(one, "id", "body", Seq.empty)
    }
  }

  test("Dedup.keepBestPerComponent keeps the longest member per component") {
    import spark.implicits._
    // 10/11 exact dups; 12 near-dup of both (one changed token →
    // J(10,12) = 9/13) — extend it by ONE token so it wins on length
    // while staying above the 0.6 threshold (9 shared shingles of
    // 11∪12 → J = 9/14 ≈ 0.643).
    val d2 = docs.withColumn("body",
      when(col("id") === 12L, concat(col("body"), lit(" extra")))
        .otherwise(col("body")))
    val out = graft.api.Dedup
      .keepBestPerComponent(d2, "id", "body", 0.6, 16, 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size == 5)
    // 10,11,12 share one component labeled by min id 10
    assert(out(10L)._1 == 10L && out(11L)._1 == 10L && out(12L)._1 == 10L)
    // 12 is longest → kept; 10 and 11 dropped
    assert(out(12L)._3 && !out(10L)._3 && !out(11L)._3)
    // singletons keep themselves
    assert(out(13L)._3 && out(14L)._3 &&
      out(13L)._1 == 13L && out(14L)._1 == 14L)
  }

  test("normalizedFamilies collapses case/punct/whitespace variants only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "hello worlds"), // different token — own family
      (5L, "an unrelated document")
    ).toDF("id", "body")
    val out = graft.api.Dedup.normalizedFamilies(docs, "id", "body")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1L) == (3L, true)) // min id keeps
    assert(out(2L) == (3L, false) && out(3L) == (3L, false))
    assert(out(4L) == (1L, true) && out(5L) == (1L, true))
  }
}
