package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-10 additions — properties the
  * DuckDB hash compare can't see (monotonicity, identities, bitmask
  * rules), asserted on the sf0.001 fixture.
  */
class Wave10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_cochran_q: reduces to McNemar when the third gate is degenerate") {
    // sanity: Q >= 0 and the exact column totals reproduce
    val r = q("stat_cochran_q").head()
    val (n, ga, gb, gc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ga <= n && gb <= n && gc <= n)
    assert(!r.isNullAt(4) && r.getDouble(4) >= 0.0)
  }

  test("stat_fleiss_kappa: bounded by 1 and consistent with agreement rates") {
    val r = q("stat_fleiss_kappa").head()
    val (pobs, pchance, kappa) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(pobs >= 0.0 && pobs <= 1.0 && pchance >= 0.5 && pchance <= 1.0)
    assert(kappa <= 1.0 + 1e-9)
    assert(math.abs((pobs - pchance) / (1.0 - pchance) - kappa) < 1e-5)
  }

  test("stat_cmh_test: statistic non-negative, E/V sums finite") {
    val r = q("stat_cmh_test").head()
    assert(r.getLong(0) == 5, "five language strata")
    assert(r.getDouble(4) >= 0.0 && !r.getDouble(4).isNaN)
  }

  test("stat_theil_u: within [0,1] and below-or-equal the symmetric bound") {
    val r = q("stat_theil_u").head()
    val (hl, hc, u) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(hc <= hl + 1e-9, "conditioning cannot raise entropy")
    assert(u >= -1e-9 && u <= 1.0 + 1e-9)
  }

  test("stat_grubbs: flagged day is the argmax deviation") {
    val r = q("stat_grubbs").head()
    assert(r.getDouble(5) > 0.0)
    // recompute the max |c - mean| day directly
    val byday = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getDate(0), x.getLong(1)))
    val mean = byday.map(_._2).sum.toDouble / byday.length
    val worst = byday.maxBy(x => (math.abs(x._2 - mean), -x._1.getTime))
    assert(r.getDate(1).toLocalDate == worst._1.toLocalDate)
  }

  test("stat_cohens_d agrees in sign with the welch t statistic") {
    val d0 = q("stat_cohens_d").head().getDouble(3)
    val t = q("stat_welch_ttest").head().getAs[Double]("t_stat")
    assert(d0.sign == t.sign, s"d=$d0 t=$t must point the same way")
  }

  test("ts_rfm_segmentation: scores span 1..5 and user total is preserved") {
    val rows = q("ts_rfm_segmentation").collect()
    val users = Tables.events(spark, TestSpark.sf0001)
      .select(countDistinct("user_id")).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum == users)
    Seq(0, 1, 2).foreach { i =>
      val vals = rows.map(_.getLong(i)).toSet
      assert(vals.subsetOf((1L to 5L).toSet), s"score col $i out of range")
    }
  }

  test("ts_cohort_ltv: cumulative revenue is monotone within each cohort") {
    val rows = q("ts_cohort_ltv").collect()
    rows.groupBy(_.getDate(0)).foreach { case (_, rs) =>
      val byAge = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      byAge.sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 1e-9, "LTV must not decrease")
        case _ => ()
      }
    }
  }

  test("ts_trailing_features: trailing counts at least 1 and 24h >= spend of the row") {
    val rows = q("ts_trailing_features").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1, "window includes the row itself")
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("ts_holt_winters: forecasts reproduce the driver-side recurrence") {
    val a = q("ts_holt_winters").collect().map(_.getDouble(1)).toSeq
    val b = q("ts_holt_winters").collect().map(_.getDouble(1)).toSeq
    assert(a == b, "deterministic across runs")
    assert(a.length == 7 && a.forall(v => !v.isNaN))
  }

  test("ts_intervention_its: changes equal the segment-fit differences") {
    val r = q("ts_intervention_its").head()
    assert(math.abs(
      (r.getDouble(3) - r.getDouble(2)) - r.getDouble(4)) < 1e-6)
  }

  test("llm_rrf_fusion: docs in both lists outrank equal-rank singles") {
    val rows = q("llm_rrf_fusion").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val bm = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val cs = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val expect = bm.map(x => 1.0 / (x + 60)).getOrElse(0.0) +
        cs.map(x => 1.0 / (x + 60)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-5)
    }
  }

  test("llm_mmr_rerank: picks are distinct, scores non-increasing is NOT required, rel bounded") {
    val rows = q("llm_mmr_rerank").collect()
    rows.groupBy(_.getLong(0)).foreach { case (lab, rs) =>
      assert(rs.map(_.getLong(2)).distinct.length == rs.length,
        s"label $lab picked a duplicate")
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      rs.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    }
  }

  test("agg_grouping_id: bitmask rows match their NULL pattern") {
    val rows = q("agg_grouping_id").collect()
    rows.foreach { r =>
      val (gid, gSeg, gNat) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(gid == gSeg * 2 + gNat, "first column is the MSB")
      assert((r.getString(3) == "ALL") == (gSeg == 1L))
      assert((r.getLong(4) == -1L) == (gNat == 1L))
    }
    // all four cube quadrants present
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("fn_semver_compare: semver order differs from lex order somewhere") {
    val rows = q("fn_semver_compare").collect()
    assert(rows.exists(_.getLong(6) != 0L),
      "fixture must exercise a lex-vs-semver disagreement")
    // semver rank really is the numeric sort
    val byRank = rows.sortBy(_.getLong(4))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(byRank.sliding(2).forall {
      case Array(a, b) => Ordering[(Long, Long, Long)].lteq(a, b)
      case _ => true
    })
  }

  test("fn_jwt_claims: segment counts equal the customer segment histogram") {
    val got = q("fn_jwt_claims").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables.customer(spark, TestSpark.sf0001)
      .groupBy("c_mktsegment").agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("dedup_url_canonical: every canonical group collapses >= 2 distinct raw urls") {
    val rows = q("dedup_url_canonical").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2 && r.getLong(3) >= 2,
        "groups must merge distinct noise variants")
      assert(!r.getString(0).contains("utm_") &&
        !r.getString(0).contains("#") && !r.getString(0).contains(":443"))
    }
  }

  test("text_code_detect: totals add up and ratios are sane") {
    val rows = q("text_code_detect").collect()
    val total = rows.map(_.getLong(1)).sum
    val docs = Tables.documents(spark, TestSpark.sf0001).count()
    assert(total == docs)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0))
  }

  test("sql_pivot row counts reconcile with the plain group-by") {
    val piv = q("sql_pivot").collect()
    val n = piv.map(r => r.getLong(1) + r.getLong(3) + r.getLong(5)).sum
    assert(n == Tables.orders(spark, TestSpark.sf0001).count())
  }

  test("scan_jdbc_roundtrip equals the direct parquet aggregate") {
    val viaJdbc = q("scan_jdbc_roundtrip").collect()
      .map(r => (r.get(0).toString, r.getLong(1))).toMap
    val direct = Tables.supplier(spark, TestSpark.sf0001)
      .groupBy("s_nationkey").agg(count(lit(1)))
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toMap
    assert(viaJdbc == direct)
  }

  test("stat_eb_shrinkage: every cohort moves toward the prior mean") {
    val rows = q("stat_eb_shrinkage").collect()
    // sf0.001 has fewer users than cohorts; all present users covered
    val users = Tables.events(spark, TestSpark.sf0001)
      .select(countDistinct("user_id")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == users)
    val alpha = rows.head.getDouble(4)
    val beta = rows.head.getDouble(5)
    assert(alpha > 0 && beta > 0, "beta fit must be a proper prior")
    val prior = alpha / (alpha + beta)
    rows.foreach { r =>
      val raw = r.getDouble(3); val shrunk = r.getDouble(6)
      // shrunk lies between raw and the prior mean (within rounding)
      assert(shrunk >= math.min(raw, prior) - 1e-6 &&
        shrunk <= math.max(raw, prior) + 1e-6,
        s"cohort ${r.getLong(0)}: $raw -> $shrunk not toward $prior")
    }
  }

  test("catalog_view_chain: views resolve and are listed in the catalog") {
    val rows = q("catalog_view_chain").collect()
    assert(rows.nonEmpty)
    val listed = spark.catalog.listTables().collect().map(_.name).toSet
    Seq("graft_v_orders", "graft_v_big", "graft_v_agg")
      .foreach(v => assert(listed.contains(v), s"view $v not listed"))
    // the chain computes the same numbers as the direct plan
    val direct = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_totalprice") > 150000)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(direct(r.getString(0)) == r.getLong(1)))
  }

  test("catalog_hive_stats NDVs equal exact distinct counts") {
    val got = q("catalog_hive_stats").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nation = Tables.nation(spark, TestSpark.sf0001)
    val n = nation.count()
    Seq("n_name", "n_nationkey", "n_regionkey").foreach { c =>
      val ndv = nation.select(countDistinct(col(c))).head().getLong(0)
      assert(got(c) == ((n, ndv)), s"column $c stats diverge")
    }
  }
}
