package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-10 second-session additions
  * (waves 5–10 + the graph_sp_count/stat_spearman rework) — the
  * properties a hash compare can't see, asserted on sf0.001.
  */
class Wave10bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("graph_sp_count: source row is (0 hops, 1 path) and counts cover hop_distance") {
    val sp = q("graph_sp_count").collect()
    val src = sp.minBy(_.getLong(0))
    assert(sp.forall(_.getLong(2) >= 1), "every reached node has >= 1 path")
    val zero = sp.filter(_.getLong(1) == 0L)
    assert(zero.length == 1 && zero.head.getLong(2) == 1L)
    // hop distances must agree with graph_hop_distance on shared nodes
    val hops = q("graph_hop_distance").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sp.foreach(r => assert(hops(r.getLong(0)) == r.getLong(1)))
  }

  test("graph_stress: leaves carry zero stress, counts match sp_count") {
    val st = q("graph_stress").collect()
    val maxd = st.map(_.getLong(1)).max
    assert(st.filter(_.getLong(1) == maxd).forall(_.getLong(3) == 0L),
      "deepest-level nodes have no continuations")
    val sp = q("graph_sp_count").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    st.foreach(r => assert(sp(r.getLong(0)) == r.getLong(2)))
  }

  test("graph_eccentricity: four sources, sane bounds") {
    val e = q("graph_eccentricity").collect()
    assert(e.length == 4)
    e.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 64)
      assert(r.getLong(2) >= 1)
    }
  }

  test("graph_ktruss: empty on the sparse sf0.001 10-min graph, discriminating at sf0.01") {
    assert(q("graph_ktruss").count() == 0L)
    val t01 = SparkEntry.queries("graph_ktruss")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(t01.nonEmpty && t01.forall(_.getLong(2) >= 2),
      "every surviving edge sits in >= k-2 = 2 triangles")
  }

  test("stat_ordinal_assoc: |gamma| >= |somers d| (same numerator, smaller denominators)") {
    q("stat_ordinal_assoc").collect().foreach { r =>
      val (g, dyx, dxy) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(g >= -1.0 && g <= 1.0)
      assert(math.abs(dyx) <= math.abs(g) + 1e-9)
      assert(math.abs(dxy) <= math.abs(g) + 1e-9)
    }
  }

  test("stat_jonckheere: J within [0, max pairs]") {
    val r = q("stat_jonckheere").head()
    val n = r.getLong(0)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= n.toDouble * n / 2)
    assert(!r.getDouble(2).isNaN)
  }

  test("stat_friedman: rank-sum identity pins chi2 >= 0 with df 6") {
    val r = q("stat_friedman").head()
    assert(r.getLong(0) >= 1, "at least one complete week")
    assert(r.getDouble(1) >= -1e-9)
    assert(r.getLong(2) == 6L)
  }

  test("stat_cronbach: alpha <= 1 on every flag") {
    q("stat_cronbach").collect().foreach { r =>
      assert(!r.isNullAt(2) && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }

  test("ts_drawdown: non-negative and achievable") {
    q("ts_drawdown").collect().foreach { r =>
      assert(r.getDouble(2) >= 0.0)
      assert(r.getString(3).nonEmpty)
    }
  }

  test("ts_bollinger: band ordering and breakout consistency") {
    q("ts_bollinger").collect().foreach { r =>
      val (v, mid, up, lo) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= mid + 1e-9 && mid <= up + 1e-9)
      if (r.getBoolean(6)) assert(v > mid)
      if (r.getBoolean(7)) assert(v < mid)
    }
  }

  test("ts_granger: nested-model R2 ordering makes F non-negative") {
    val r = q("ts_granger").head()
    val (r2r, r2u) = (r.getDouble(1), r.getDouble(2))
    assert(r2u >= r2r - 1e-9, "adding a regressor cannot lower R2")
    assert(r.getDouble(3) >= -1e-6)
  }

  test("dq_orphan_check: the fixture's six FK edges are clean") {
    val rows = q("dq_orphan_check").collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("catalog_fk_infer: six true edges + region edge infer, decoy rejected") {
    val rows = q("catalog_fk_infer").collect()
    assert(rows.length == 8)
    val byPair = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getBoolean(5)).toMap
    assert(!byPair(("orders.o_custkey", "supplier.s_suppkey")),
      "decoy pair must not infer as FK")
    assert(byPair.values.count(identity) == 7)
  }

  test("catalog_key_candidates: primary keys unique, lineitem.l_orderkey not") {
    val rows = q("catalog_key_candidates").collect()
    val uniq = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getBoolean(5)).toMap
    assert(uniq(("orders", "o_orderkey")))
    assert(uniq(("customer", "c_custkey")))
    assert(!uniq(("lineitem", "l_orderkey")))
  }

  test("llm_rake_keywords: degree >= freq so scores >= 1; stopwords excluded") {
    val rows = q("llm_rake_keywords").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "each occurrence adds >= 1 degree")
      assert(r.getDouble(3) >= 1.0 - 1e-9)
      assert(r.getString(0) != "a" && r.getString(0) != "the")
    }
  }

  test("llm_pmi_cooccur: pairs ordered, counts positive, pmi finite") {
    q("llm_pmi_cooccur").collect().foreach { r =>
      assert(r.getString(0) <= r.getString(1))
      assert(r.getLong(2) >= 1)
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    }
  }

  test("text_vocab_growth: both cumulative axes monotone, TTR falls as corpus grows") {
    val rows = q("text_vocab_growth").collect().sortBy(_.getLong(0))
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) >= a.getLong(1))
      assert(b.getLong(2) >= a.getLong(2))
    }
    assert(rows.last.getDouble(3) <= rows.head.getDouble(3) + 1e-9,
      "type-token ratio decays (Heaps)")
  }

  test("fn_regexp_suite: rotation preserves length, k extraction round-trips") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_id") < 50)
      .select(col("event_id"), col("event_type")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    q("fn_regexp_suite").collect().foreach { r =>
      assert(r.getString(3).length == ev(r.getLong(0)).length)
      assert(r.getLong(1) >= 0)
    }
  }

  test("llm_snapshot_diff: shares sum to one over the four classes") {
    val rows = q("llm_snapshot_diff").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("added", "changed", "removed", "unchanged"))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3)
  }

  test("ts_entropy_rate: between zero and the iid ceiling") {
    val r = q("ts_entropy_rate").head()
    val k = r.getLong(0)
    val h = r.getDouble(2)
    assert(h >= -1e-9 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9)
    assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
  }
}
