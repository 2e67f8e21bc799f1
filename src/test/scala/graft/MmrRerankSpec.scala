package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-9 additions that the DuckDB hash-compare
  * cannot express: MMR's greedy diversity invariants, the cell-balance
  * report's conservation laws, and the CUSUM closed form agreeing with
  * the textbook recursion.
  */
class MmrRerankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def embs = Tables.embeddings(spark, TestSpark.sf0001)

  test("mmrRerank picks k distinct pool members per label, pick 1 = max relevance") {
    val out = graft.api.Similarity
      .mmrRerank(embs, "vec_id", "embedding", "label", pool = 8, k = 4)
      .collect()
    val byLabel = out.groupBy(_.getInt(0))
    assert(byLabel.nonEmpty)
    byLabel.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).distinct.length == rows.length,
        "duplicate vec_id selected")
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq)
      val first = rows.find(_.getLong(1) == 1L).get
      val maxRel = rows.map(_.getDouble(3)).max
      assert(first.getDouble(3) == maxRel,
        "pick 1 must be the most relevant candidate")
      // score = 0.7·rel − 0.3·msim with msim ∈ [−1, 1]
      rows.filter(_.getLong(1) > 1L).foreach { r =>
        val rel = r.getDouble(3); val score = r.getDouble(4)
        assert(score <= 0.7 * rel + 0.3 + 1e-9 &&
          score >= 0.7 * rel - 0.3 - 1e-9,
          s"score $score outside the λ-feasible band for rel $rel")
      }
    }
  }

  test("cellAssignments conserves the corpus and nests within suggest bounds") {
    val a = graft.api.Similarity
      .cellAssignments(embs, "vec_id", "embedding", k = 16, iters = 5)
    val n = embs.count()
    assert(a.count() == n, "every vector assigned exactly once")
    assert(a.select("cell").distinct().count() <= 16)
    val negative = a.filter(col("dist") < 0).count()
    assert(negative == 0, "squared distances must be non-negative")
  }

  test("ts_cusum closed form equals the textbook max(0, prev + z - k) recursion") {
    val rows = SparkEntry.queries("ts_cusum")(spark, TestSpark.sf0001)
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { case (_, series) =>
      var sPos = 0.0
      series.sortBy(_.getString(1)).foreach { r =>
        val z = r.getDouble(2)
        sPos = math.max(0.0, sPos + z - 0.25)
        assert(math.abs(sPos - r.getDouble(3)) < 1e-9,
          s"closed-form cusum_pos diverged from recursion at ${r.getString(1)}")
      }
    }
  }
}
