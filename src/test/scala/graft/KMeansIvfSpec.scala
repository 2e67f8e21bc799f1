package graft

import graft.functions.CosineSim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained-IVF quality evidence (SURVEY §2.L `ann_ivf_trained`):
  * the k-means codebook is deterministic across runs, and its recall@1
  * against exact brute-force ground truth beats the first-k stand-in
  * codebook of `ann_ivf_cells` — i.e. training the codebook actually
  * retrieves better, which is the point of training it. Also measures
  * the multi-probe recall curve (probes=1/2/4) asserted monotone.
  */
class KMeansIvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def embs = Tables.embeddings(spark, TestSpark.sf0001)

  /** Exact top-1 neighbor per vector by cosine (all-pairs; 500 vectors
    * at sf0.001 — test-scale only, this is the ground truth oracle).
    */
  private lazy val groundTruth: Map[Long, Long] = {
    CosineSim.register(spark)
    val e = graft.api.Similarity.prepare(embs, "vec_id", "embedding")
      .select(col("vec_id"), col("__v"))
    val w = Window.partitionBy("a_id").orderBy(col("cos_sim").desc, col("b_id"))
    e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        expr("cosine_sim(a.__v, b.__v)").as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Fraction of vectors whose ANN top-1 equals the true top-1. */
  private def recallAt1(ann: DataFrame): Double = {
    val top1 = ann.filter(col("rn") === 1)
      .select(col("vec_id"), col("nbr_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    groundTruth.count { case (id, nbr) => top1.get(id).contains(nbr) }
      .toDouble / groundTruth.size
  }

  test("k-means codebook is deterministic across runs") {
    graft.api.Similarity.clearCodebookCache()
    val cb1 = graft.api.Similarity.kmeansCodebook(embs, "vec_id", "embedding")
    graft.api.Similarity.clearCodebookCache() // force a real second training
    val cb2 = graft.api.Similarity.kmeansCodebook(embs, "vec_id", "embedding")
    assert(!(cb1 eq cb2), "second call must be a fresh training, not the cache")
    assert(cb1.length == 16 && cb1.forall(_.length == 64))
    assert(cb1.zip(cb2).forall { case (a, b) => a.sameElements(b) })
  }

  test("trained IVF recall@1 beats the first-k stand-in codebook") {
    val standIn = recallAt1(graft.api.Similarity
      .ivfNeighbors(embs, "vec_id", "embedding", nCentroids = 16, topK = 1))
    val trained = recallAt1(graft.api.Similarity
      .ivfTrainedNeighbors(embs, "vec_id", "embedding", topK = 1))
    info(f"recall@1: first-k stand-in=$standIn%.3f trained=$trained%.3f")
    assert(trained > standIn,
      s"training the codebook must improve retrieval ($trained <= $standIn)")
    // Probe-1-of-16-cells touches 1/16 of the corpus; a random partition
    // would land recall ≈ 1/16 ≈ 0.06. Trained k-means measures ~0.29
    // here — assert a regression floor of 4× random.
    assert(trained >= 0.25, s"trained recall@1 unreasonably low: $trained")
  }

  test("IVF-routed same-label kNN is a sound approximation of the exact form") {
    // llm_knn_ivf's API: every returned pair must be valid (same label,
    // no self, no duplicates, cos_sim descending per vector), and the
    // cell restriction must still find a decent share of the exact
    // within-label top-1 neighbors (recall floor on the fixture).
    val ivf = graft.api.Similarity
      .knnPerLabelIvf(embs, "vec_id", "embedding", "label", topK = 3, probes = 2)
      .collect()
    val byVec = ivf.groupBy(_.getAs[Long]("vec_id"))
    byVec.values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
      val nbrs = rows.map(_.getAs[Long]("nbr_id"))
      assert(nbrs.distinct.length == nbrs.length, "duplicate neighbor from probe fan-out")
      assert(!nbrs.contains(rows.head.getAs[Long]("vec_id")), "self-pair")
    }
    val labels = embs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    ivf.foreach { r =>
      assert(labels(r.getAs[Long]("vec_id")) == labels(r.getAs[Long]("nbr_id")))
    }
    val exactTop1 = graft.api.Similarity
      .knnPerLabel(embs, "vec_id", "embedding", "label", topK = 1)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nbr_id")).toMap
    val ivfTop1 = ivf.filter(_.getAs[Int]("rn") == 1)
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nbr_id")).toMap
    val hits = exactTop1.count { case (v, n) => ivfTop1.get(v).contains(n) }
    val recall = hits.toDouble / exactTop1.size
    info(f"same-label IVF kNN recall@1 = $recall%.3f (probes=2)")
    assert(recall >= 0.3, s"label+cell blocking recall unreasonably low: $recall")
  }

  test("auto-k plumbing: ivfTrainedNeighbors at suggestCells(n) is well-formed") {
    val n = embs.count()
    val k = graft.api.Similarity.suggestCells(n)
    assert(k >= 16 && k <= 4096)
    val ann = graft.api.Similarity
      .ivfTrainedNeighbors(embs, "vec_id", "embedding", k = k, topK = 1)
      .collect()
    assert(ann.nonEmpty)
    // one neighbor per vector that shares a cell with someone; cells
    // are legal ids under the suggested codebook
    assert(ann.forall(r => r.getAs[Int]("cell") >= 0 && r.getAs[Int]("cell") < k))
    assert(ann.map(_.getAs[Long]("vec_id")).distinct.length == ann.length)
  }

  test("suggestCells follows the measured sqrt-n rule with sane clamps") {
    import graft.api.Similarity.suggestCells
    assert(suggestCells(100) == 16)          // floor
    assert(suggestCells(100000) == 316)      // ~sqrt(100k), the sweep's regime
    assert(suggestCells(1000000000L) == 4096) // ceiling
    assert(suggestCells(0) == 16)
  }

  test("knnPerLabel rejects corpora above the exact-form guard") {
    val ex = intercept[IllegalArgumentException] {
      graft.api.Similarity
        .knnPerLabel(embs, "vec_id", "embedding", "label", maxExactRows = 10)
    }
    assert(ex.getMessage.contains("knnPerLabelIvf"),
      s"guard must point at the scale path: ${ex.getMessage}")
    // and the default bound admits the fixture (the declared query path)
    assert(graft.api.Similarity
      .knnPerLabel(embs, "vec_id", "embedding", "label", topK = 1)
      .limit(1).count() == 1)
  }

  test("ann_pq_adc is run-deterministic and ADC tracks true distance") {
    val run1 = SparkEntry.queries("ann_pq_adc")(spark, TestSpark.sf0001)
      .collect().toSeq
    val run2 = SparkEntry.queries("ann_pq_adc")(spark, TestSpark.sf0001)
      .collect().toSeq
    assert(run1 == run2, "PQ codes/LUT must be run-stable")
    assert(run1.size == 10)
    // ADC is a lossy estimate of the true subspace-sum distance, but on
    // the top-10 it must stay the same order of magnitude — a gross
    // mismatch means codes and LUT disagree about the codebooks
    run1.foreach { r =>
      val adc = r.getDouble(1); val t = r.getDouble(2)
      assert(adc >= 0 && t > 0, s"row $r")
      assert(adc < 4 * t + 1, s"ADC wildly overshoots true distance: $r")
    }
  }

  test("multi-probe recall curve is monotone and reaches higher recall") {
    val recalls = Seq(1, 2, 4).map { p =>
      p -> recallAt1(graft.api.Similarity
        .ivfTrainedNeighbors(embs, "vec_id", "embedding", topK = 1, probes = p))
    }
    info(recalls.map { case (p, r) => f"probes=$p recall@1=$r%.3f" }.mkString(", "))
    recalls.sliding(2).foreach { case Seq((_, lo), (_, hi)) =>
      assert(hi >= lo, s"recall must not decrease with more probes: $recalls")
    }
    assert(recalls.last._2 > recalls.head._2,
      s"probing 4 cells should strictly improve recall@1 at this scale: $recalls")
  }

  test("semDedup probes=2 recovers strictly more duplicates than probes=1") {
    // the boundary-miss recall gap the probe dial exists to close
    // (r10, VERDICT next #6): every probes=1 drop must also be found
    // at probes=2 (superset), and the fixture must demonstrate at
    // least one recovered boundary pair
    def dropped(p: Int): Set[Long] = graft.api.Similarity
      .semDedup(embs, "vec_id", "embedding", probes = p)
      .filter(!org.apache.spark.sql.functions.col("kept"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val d1 = dropped(1)
    val d2 = dropped(2)
    info(s"probes=1 drops ${d1.size}, probes=2 drops ${d2.size}")
    assert(d1.subsetOf(d2),
      s"probes=2 must recover every home-cell duplicate: missing ${d1 -- d2}")
    assert(d2.size > d1.size,
      "probes=2 should recover at least one boundary pair on the fixture")
  }
}
