package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in scale-path selection for single-query cosine top-k
  * (plans/CosineTopK.scala): exact by default, LSH-bucketed only when
  * the corpus is estimated large AND the user opted in.
  */
class ScalePathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def embs = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("default (no opt-in) resolves to the exact brute-force path") {
    val auto = rows(graft.api.Similarity.topKAuto(embs, "vec_id", "embedding", 0L, 10))
    val exact = rows(graft.api.Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 10))
    assert(auto == exact)
  }

  test("opt-in + low threshold resolves to the LSH-bucketed approximate path") {
    withConf(
      graft.plans.CosineTopK.EnabledKey -> "true",
      graft.plans.CosineTopK.MinBytesKey -> "1") {
      val auto = rows(graft.api.Similarity.topKAuto(embs, "vec_id", "embedding", 0L, 10))
      val lsh = rows(graft.api.Similarity.lshTopK(embs, "vec_id", "embedding", 0L, 10))
      assert(auto == lsh)
      // the approximate path restricts scoring to the query's bucket:
      // strictly fewer candidates than the corpus can even reach top-k
      assert(auto.nonEmpty && auto.length <= 10)
    }
  }

  test("a parent projection over the node survives column pruning") {
    // regression: CosineTopK carries idCol/vecCol as strings, so its
    // expression-derived references were empty and ColumnPruning
    // stripped the vector column from the child before the late
    // resolution rule ran (UNRESOLVED_COLUMN on `embedding`); the
    // references override keeps the needed columns alive
    import org.apache.spark.sql.functions.{col, round}
    withConf(
      graft.plans.CosineTopK.EnabledKey -> "true",
      graft.plans.CosineTopK.MinBytesKey -> "1",
      graft.plans.CosineTopK.PlanesKey -> "4") {
      val projected = rows(
        graft.api.Similarity.topKAuto(embs, "vec_id", "embedding", 0L, 10)
          .select(col("vec_id"), round(col("cos_sim"), 4).as("cos_sim")))
      val lsh = rows(
        graft.api.Similarity.lshTopK(embs, "vec_id", "embedding", 0L, 10, nPlanes = 4)
          .select(col("vec_id"), round(col("cos_sim"), 4).as("cos_sim")))
      assert(projected == lsh)
      assert(projected.nonEmpty)
    }
  }

  test("a small corpus stays exact even when opted in (threshold gate)") {
    withConf(
      graft.plans.CosineTopK.EnabledKey -> "true",
      graft.plans.CosineTopK.MinBytesKey -> (1L << 40).toString,
      graft.plans.CosineTopK.MinRowsKey -> Long.MaxValue.toString) {
      val auto = rows(graft.api.Similarity.topKAuto(embs, "vec_id", "embedding", 0L, 10))
      val exact = rows(graft.api.Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 10))
      assert(auto == exact)
    }
  }

  test("threshold crossed WITHOUT opt-in stays exact (never a silent rewrite)") {
    withConf(graft.plans.CosineTopK.MinBytesKey -> "1") {
      val auto = rows(graft.api.Similarity.topKAuto(embs, "vec_id", "embedding", 0L, 10))
      val exact = rows(graft.api.Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 10))
      assert(auto == exact)
    }
  }
}
