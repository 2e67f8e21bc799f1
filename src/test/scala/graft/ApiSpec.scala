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

  test("Dedup.simhash: identical docs identical, near-dups close in hamming") {
    val h = graft.api.Dedup.simhash(docs, "id", "body")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(10L) == h(11L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(10L), h(12L)) < hamming(h(10L), h(13L)),
      s"near-dup not closer: ${h.toSeq.sorted}")
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

  test("TextMetrics.quality adds the metric columns, preserves rows") {
    val q = graft.api.TextMetrics.quality(docs, "id", "body")
    assert(q.count() == 5)
    assert(Seq("n_words", "avg_word_len", "stopword_ratio", "quality")
      .forall(q.columns.contains))
    assert(q.select(min(col("quality"))).head.getDouble(0) >= 0.0)
    assert(q.select(max(col("quality"))).head.getDouble(0) <= 1.0)
  }
}
