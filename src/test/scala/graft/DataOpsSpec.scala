package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog inventory, multimodal plumbing, simhash, and ANN checks. */
class DataOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("catalog_column_inventory lists all 10 tables with correct types") {
    val inv = q("catalog_column_inventory").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(inv.map(_._1).distinct.size == 10)
    assert(inv.contains(("lineitem", "l_orderkey", "bigint")))
    assert(inv.contains(("embeddings", "embedding", "array<float>")))
    // ts's physical type depends on fixture version: ns-long (read as
    // bigint under nanosAsLong) pre-round-9, µs TIMESTAMP_NTZ after.
    val tsType = inv.collectFirst { case ("events", "ts", t) => t }.get
    assert(Set("bigint", "timestamp_ntz").contains(tsType))
  }

  test("mm_binary_features: stubbed decode is deterministic and byte-true") {
    val rows = q("mm_binary_features").collect()
    assert(rows.length == 500)
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), length(encode(col("text"), "utf-8")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.take(20).foreach { r =>
      val (id, nBytes) = (r.getLong(0), r.getLong(1))
      assert(nBytes == docs(id).toLong)
      assert(r.getAs[String]("sha256_hex").length == 64)
      assert(r.getAs[Long]("n_frames") == nBytes / 100 + 1)
    }
  }

  test("dedup_simhash: one fingerprint per doc; near-dup prefix docs closer") {
    val rows = q("dedup_simhash").collect()
    assert(rows.length == 500)
    val hashes = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.values.forall(h => h >= 0 && h < (1L << 32)))
  }

  test("ann_lsh_bucketed similarity never exceeds brute-force best") {
    val ann = q("ann_lsh_bucketed").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ann.nonEmpty)
    // brute-force best neighbor of vec 0 from the declared baseline query
    val brute = q("llm_cosine_topk").collect().head.getDouble(1)
    ann.get(0L).foreach(a => assert(a <= brute + 1e-9))
  }

  test("text_lang_id predicts an observed language for every doc") {
    val rows = q("text_lang_id").collect()
    assert(rows.length == 500)
    // note: the corpus actually contains 5 langs (incl. 'fr'), one more
    // than FIXTURES.md recorded — derive the valid set from the data
    val langs = Tables.documents(spark, TestSpark.sf0001)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.forall(r => langs(r.getString(2))))
  }

  test("Similarity.semDedup drops the later near-identical vector, keeps the rest") {
    import spark.implicits._
    // 1↔2 nearly identical (cos ≈ 0.9999), everything else orthogonal
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f, 0f, 0f)),
      (2L, Array(1.0f, 0.02f, 0f, 0f)),
      (3L, Array(0f, 1.0f, 0f, 0f)),
      (4L, Array(0f, 0f, 1.0f, 0f)),
      (5L, Array(0f, 0f, 0f, 1.0f))).toDF("vid", "emb")
    val out = graft.api.Similarity
      .semDedup(vecs, "vid", "emb", k = 3, iters = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out.size == 5)
    assert(out(1L)._1, "earliest of the dup pair must be kept")
    assert(!out(2L)._1 && out(2L)._2.contains(1L),
      s"2 must be dropped as a dup of 1, got ${out(2L)}")
    assert(Seq(3L, 4L, 5L).forall(out(_)._1), "orthogonal vectors all kept")
  }

  test("llm_semdedup on the fixture: verdict consistent, real drop mass") {
    val rows = q("llm_semdedup").collect()
    assert(rows.length == 500)
    val dropped = rows.filterNot(_.getBoolean(2))
    assert(dropped.nonEmpty, "τ=0.4 must drop at least one vector at sf0.001")
    dropped.foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(3) < r.getLong(0),
        "dup_of must be an earlier id")
      assert(r.getDouble(4) >= 0.4)
    }
    rows.filter(_.getBoolean(2)).foreach(r =>
      assert(r.isNullAt(3) && r.isNullAt(4), "kept rows carry no dup info"))
  }

  test("join_spatial_grid matches the brute-force cross join at sf0.001") {
    // 150 customers × 10 suppliers — small enough to verify the grid
    // blocking finds EXACTLY the pairs the unblocked cross join finds.
    def coord(tag: String, key: String, from: Int) =
      conv(substring(md5(concat(lit(tag), col(key).cast("string"))),
        from, 5), 16, 10).cast("long") % 4096
    val cust = Tables.customer(spark, TestSpark.sf0001)
      .select(col("c_custkey"), col("c_nationkey"),
        coord("pt:", "c_custkey", 1).as("x"),
        coord("pt:", "c_custkey", 6).as("y"))
    val supp = Tables.supplier(spark, TestSpark.sf0001)
      .select(col("s_suppkey"),
        coord("pt:", "s_suppkey", 1).as("sx"),
        coord("pt:", "s_suppkey", 6).as("sy"))
    val brute = cust.crossJoin(supp)
      .filter(abs(col("x") - col("sx")) <= 96 &&
        abs(col("y") - col("sy")) <= 96)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val grid = q("join_spatial_grid").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(grid == brute, s"grid $grid vs brute $brute")
  }

  test("llm_rouge2_pairs: bounded metrics, overlap matches brute recount") {
    val rows = q("llm_rouge2_pairs").collect()
    assert(rows.nonEmpty, "LSH surfaced no candidate pairs at sf0.001")
    rows.foreach { r =>
      val (p, rec, f1) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p >= 0.0 && p <= 1.0); assert(rec >= 0.0 && rec <= 1.0)
      assert(f1 >= 0.0 && f1 <= 1.0)
      // F1 is the harmonic mean: never above both sides
      assert(f1 <= math.max(p, rec) + 1e-9)
    }
    // recount the clipped bigram overlap of every pair in plain Scala
    val texts = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bigrams(t: String): Map[String, Int] = {
      val toks = t.toLowerCase.replaceAll("[^a-z ]", "").split(" ", -1)
      toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, o) => g -> o.length }
    }
    rows.foreach { r =>
      val ba = bigrams(texts(r.getLong(0)))
      val bb = bigrams(texts(r.getLong(1)))
      val clipped = ba.keysIterator
        .map(g => math.min(ba(g), bb.getOrElse(g, 0))).sum.toLong
      assert(r.getLong(2) == clipped,
        s"pair ${r.getLong(0)},${r.getLong(1)}: ${r.getLong(2)} vs $clipped")
    }
  }

  test("mm_clip_filter: one row per doc-vector pair, cosine bounded, keep consistent") {
    val rows = q("mm_clip_filter").collect()
    assert(rows.length == 500, "every embedding row must be scored")
    rows.foreach { r =>
      val a = r.getDouble(1)
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"cosine out of range: $a")
      // keep is dot ≥ 0, and the rounded cosine must agree in sign
      // (away from the rounding boundary)
      if (math.abs(a) > 1e-3) assert(r.getBoolean(2) == (a > 0))
    }
    // the stubbed hash encoder must actually discriminate: both
    // classes present, scores not constant
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
    assert(rows.map(_.getDouble(1)).distinct.length > 100)
  }
}
