package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the retrieval / linkage operators (llm_inverted_index,
  * llm_bm25_topk, llm_kl_divergence, dedup_blocked_linkage) on sf0.001.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("llm_inverted_index: df matches a direct distinct-doc count; heads sorted, <=10") {
    val rows = SparkEntry.queries("llm_inverted_index")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    // independent recomputation of df for every emitted token
    val want = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        explode(graft.functions.TextUdfs.tokenizeCol(col("text"))).as("token"))
      .groupBy("token").agg(countDistinct("doc_id").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (token, df, totalTf, head) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(df >= 5 && df == want(token), s"$token df=$df want=${want(token)}")
      assert(totalTf >= df, "each posting contributes at least tf=1")
      val ids = head.split(",").map(_.toLong)
      assert(ids.length <= 10 && (ids sameElements ids.sorted))
      assert(ids.length == math.min(10L, df).toInt)
    }
  }

  test("llm_bm25_topk: scores positive and non-increasing, <=20 rows") {
    val rows = SparkEntry.queries("llm_bm25_topk")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= 3))
  }

  test("llm_kl_divergence: KL >= 0 per source, vocab_used <= vocab") {
    val rows = SparkEntry.queries("llm_kl_divergence")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1e-4,
        s"${r.getString(0)}: KL must be non-negative, got ${r.getDouble(3)}")
      assert(r.getLong(2) >= 1 && r.getLong(1) >= r.getLong(2))
    }
  }

  test("dedup_blocked_linkage: pairs canonical, same block, dist bound holds") {
    val rows = SparkEntry.queries("dedup_blocked_linkage")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ka, kb, na, nb, dist) = (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5))
      assert(ka < kb)
      assert(na.split(" ").head == nb.split(" ").head, "blocking key equality")
      assert(dist <= 2)
      // Levenshtein reference check on the emitted pair
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      assert(lev(na, nb) == dist)
    }
  }
}
