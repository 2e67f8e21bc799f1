package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-9 fourth-wave operators. Each test checks a
  * property that must hold on ANY input (conservation laws, closed
  * forms, algebraic identities), so they catch logic drift rather than
  * pinning fixture constants; the inference statistics are additionally
  * re-derived driver-side from the raw fixture.
  */
class WaveFourSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("win_slope_rolling: matches a driver-side OLS on one user's frames") {
    val rows = q("win_slope_rolling").collect()
    assert(rows.nonEmpty)
    // re-derive the (ep, event_id)-ordered series for the first user
    val uid = rows.head.getLong(1)
    val series = Tables.events(spark, TestSpark.sf0001)
      .filter(col("user_id") === uid)
      .select(expr("unix_micros(ts) div 1000000").as("ep"), col("event_id"),
        col("value"))
      .orderBy("ep", "event_id").collect()
      .map(r => BigDecimal(r.getDouble(2)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100)
    val byId = rows.filter(_.getLong(1) == uid)
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val ids = Tables.events(spark, TestSpark.sf0001)
      .filter(col("user_id") === uid)
      .orderBy(expr("unix_micros(ts) div 1000000"), col("event_id"))
      .select("event_id").collect().map(_.getLong(0))
    var checked = 0
    for (i <- series.indices if i >= 4) { // n >= 5 after frame fill
      val lo = math.max(0, i - 20)
      val xs = (lo to i).map(j => BigInt(j + 1))
      val ys = (lo to i).map(j => series(j).toBigInt)
      val n = BigInt(xs.size)
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val num100 = (n * sxy - sx * sy) * 100
      val den = n * sxx - sx * sx
      val k =
        if (num100 >= 0) (2 * num100 + den) / (2 * den)
        else -((2 * -num100 + den) / (2 * den))
      val expected = k.toDouble / 10000.0
      byId.get(ids(i)).foreach { case (nOut, slope) =>
        assert(nOut == xs.size.toLong)
        assert(slope == expected,
          s"row $i: slope $slope != recomputed $expected")
        checked += 1
      }
    }
    assert(checked >= 5, s"only $checked frames cross-checked")
  }

  test("win_islands_activity: islands conserve active days; longest is max") {
    val rows = q("win_islands_activity").collect()
    assert(rows.nonEmpty)
    val truth = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy("user_id").agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (uid, nActive, nIsl, longest) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nActive == truth(uid), s"user $uid active-day conservation")
      assert(nIsl >= 1 && nIsl <= nActive)
      assert(longest >= (nActive + nIsl - 1) / nIsl && longest <= nActive,
        s"user $uid longest=$longest outside pigeonhole bounds")
    }
  }

  test("ts_decompose_ma: 24 hods, trimmed-row conservation, remainder >= 0") {
    val rows = q("ts_decompose_ma").collect()
    assert(rows.length == 24)
    val nHours = Tables.events(spark, TestSpark.sf0001)
      .select(date_trunc("hour", col("ts"))).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nHours - 24,
      "centered 2x24 MA trims exactly 12 rows per side")
    rows.foreach(r => assert(r.getDouble(3) >= 0.0, "remainder MS >= 0"))
  }

  test("ts_concurrency_sweep: balanced sweep, non-negative active, ends at 0") {
    val rows = q("ts_concurrency_sweep").orderBy("day").collect()
    val nOrders = Tables.orders(spark, TestSpark.sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    assert(rows.map(_.getLong(2)).sum == nOrders)
    rows.foreach(r => assert(r.getLong(3) >= 0, s"negative active on ${r.get(0)}"))
    assert(rows.last.getLong(3) == 0, "every interval must close")
    // running-sum identity: active(last) == sum(net) == 0 checked above;
    // spot-check the recursion at each step
    var run = 0L
    rows.foreach { r =>
      run += r.getLong(1) - r.getLong(2)
      assert(run == r.getLong(3))
    }
  }

  test("stat_welch_ttest: t and df match a driver-side recomputation") {
    val r = q("stat_welch_ttest").head()
    val vals = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(x =>
        (BigDecimal(x.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong) }
    def mom(k: String) = {
      val xs = vals(k)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (na, sa, qa) = mom("click"); val (nb, sb, qb) = mom("purchase")
    def se2(n: Long, s: Long, q2: Long) =
      (n.toDouble * q2.toDouble - s.toDouble * s.toDouble) /
        (n.toDouble * (n - 1).toDouble) / n.toDouble
    val (sea, seb) = (se2(na, sa, qa), se2(nb, sb, qb))
    val t = (sa.toDouble / na - sb.toDouble / nb) / math.sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1).toDouble + seb * seb / (nb - 1).toDouble)
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(math.abs(r.getDouble(4) - t) < 1e-12, s"t ${r.getDouble(4)} vs $t")
    assert(math.abs(r.getDouble(5) - df) < 1e-9)
    assert(df >= math.min(na - 1, nb - 1).toDouble - 1e-9 &&
      df <= (na + nb - 2).toDouble + 1e-9, "Satterthwaite df bounds")
  }

  test("stat_trend_armitage: z matches driver-side exact-integer recomputation") {
    val r = q("stat_trend_armitage").head()
    val byDay = Tables.events(spark, TestSpark.sf0001)
      .groupBy(dayofmonth(col("ts")).cast("long").as("x"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("s"))
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    val bigN = byDay.map(_._2).sum; val bigS = byDay.map(_._3).sum
    val xs = byDay.map(t => t._1 * t._3).sum
    val xn = byDay.map(t => t._1 * t._2).sum
    val xxn = byDay.map(t => t._1 * t._1 * t._2).sum
    val a = bigN * xs - bigS * xn
    val b = bigN * xxn - xn * xn
    val z = a.toDouble / math.sqrt(
      bigS.toDouble * (bigN - bigS).toDouble * b.toDouble / bigN.toDouble)
    assert(r.getLong(1) == bigN && r.getLong(2) == bigS)
    assert(math.abs(r.getDouble(3) - z) < 1e-12)
  }

  test("stat_capture_recapture: Chapman bounds and exact floor division") {
    val r = q("stat_capture_recapture").head()
    val (n1, n2, m, nTrue, nHat) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(m <= math.min(n1, n2), "overlap bounded by both captures")
    assert(n1 <= nTrue && n2 <= nTrue)
    assert(nHat == (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    assert(nHat >= math.max(n1, n2) - 1, "estimate covers either capture")
    assert(r.getDouble(5) >= 0.0, "variance non-negative")
  }

  test("mm_tile_grid: tiles partition each image exactly") {
    val rows = q("mm_tile_grid").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (doc, ts) =>
      val w = ts.head.getLong(1); val h = ts.head.getLong(2)
      val area = ts.map(r => r.getLong(6) * r.getLong(7)).sum
      assert(area == w * h, s"doc $doc: tile areas $area != $w*$h")
      val ids = ts.map(_.getLong(3)).sorted
      assert(ids.sameElements(0L until ids.length.toLong),
        "row-major ids dense")
      ts.foreach { r =>
        assert(r.getLong(6) >= 1 && r.getLong(6) <= 32)
        assert(r.getLong(7) >= 1 && r.getLong(7) <= 32)
      }
    }
  }

  test("ds_typed_cogroup: zero-order customers kept, totals match a join") {
    val rows = q("ds_typed_cogroup").collect()
    val nBuilding = Tables.customer(spark, TestSpark.sf0001)
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(rows.length.toLong == nBuilding,
      "cogroup must keep customers with zero orders")
    val direct = Tables.customer(spark, TestSpark.sf0001)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, TestSpark.sf0001),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) == direct(r.getLong(0))))
  }

  test("fn_collate_compare: 3 case variants fold to 1 name under LCASE") {
    val rows = q("fn_collate_compare").collect()
    rows.foreach { r =>
      assert(r.getLong(2) == 3 * r.getLong(1),
        "each case-folded name carries exactly its 3 variants")
      assert(r.getLong(3) >= r.getLong(1) && r.getLong(3) <= r.getLong(2),
        "binary distinct between folded and total")
    }
  }

  test("fn_aes_roundtrip: decrypt inverts encrypt, PKCS length law") {
    val rows = q("fn_aes_roundtrip").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} failed roundtrip")
      assert(r.getString(2) == r.getString(0))
      val len = r.getLong(1)
      assert(len % 16 == 0 && len == (r.getString(0).length / 16 + 1) * 16)
    }
  }

  test("graph_hits: scores in [0,1], both maxima attained, mutual support") {
    val rows = q("graph_hits").collect()
    assert(rows.nonEmpty)
    val hubs = rows.map(_.getDouble(1)); val auths = rows.map(_.getDouble(2))
    assert(hubs.forall(h => h >= 0.0 && h <= 1.0))
    assert(auths.forall(a => a >= 0.0 && a <= 1.0))
    assert(hubs.max == 1.0, "max-normalized hub score must attain 1")
    assert(auths.max == 1.0, "max-normalized authority score must attain 1")
    // u→v with u<v: the smallest node id can never be an authority,
    // the largest can never be a hub
    val minNode = rows.map(_.getLong(0)).min
    val maxNode = rows.map(_.getLong(0)).max
    assert(rows.find(_.getLong(0) == minNode).get.getDouble(2) == 0.0)
    assert(rows.find(_.getLong(0) == maxNode).get.getDouble(1) == 0.0)
  }

  test("ts_dtw_distance: matches an independent rolling-array DP; bounds hold") {
    val r = q("ts_dtw_distance").head()
    def series(t: String): Array[Long] =
      Tables.events(spark, TestSpark.sf0001)
        .filter(col("event_type") === t)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .orderBy("day").select("c").collect().map(_.getLong(0))
    val a = series("click"); val b = series("purchase")
    // independent formulation: 1-D rolling array instead of the full grid
    val big = Long.MaxValue / 4
    var prev = Array.fill(b.length + 1)(big)
    for (i <- 1 to a.length) {
      val cur = Array.fill(b.length + 1)(big)
      for (j <- 1 to b.length) {
        val c = math.abs(a(i - 1) - b(j - 1))
        val best =
          if (i == 1 && j == 1) 0L
          else math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = c + best
      }
      prev = cur
    }
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(r.getLong(2) == prev(b.length), "DP formulations must agree")
    // lower bound: no alignment can beat the total-mass gap
    assert(r.getLong(2) >= math.abs(a.sum - b.sum) / math.max(a.length, b.length))
    // upper bound (n == m here): the no-warp diagonal path is feasible
    if (a.length == b.length)
      assert(r.getLong(2) <= a.zip(b).map { case (x, y) => math.abs(x - y) }.sum)
  }

  test("ts_hmm_viterbi: decoded path beats any constant path; obs matches data") {
    val rows = q("ts_hmm_viterbi").orderBy("t").collect()
    assert(rows.nonEmpty)
    val obs = rows.map(_.getLong(1).toInt)
    val path = rows.map(_.getLong(2).toInt)
    val lt = Array(Array(math.log(0.8), math.log(0.2)),
      Array(math.log(0.3), math.log(0.7)))
    val le = Array(Array(math.log(0.7), math.log(0.3)),
      Array(math.log(0.2), math.log(0.8)))
    def ll(p: Array[Int]): Double = {
      var s = math.log(0.5) + le(p(0))(obs(0))
      for (t <- 1 until p.length) s += lt(p(t - 1))(p(t)) + le(p(t))(obs(t))
      s
    }
    val decoded = ll(path)
    assert(decoded >= ll(Array.fill(path.length)(0)) - 1e-12)
    assert(decoded >= ll(Array.fill(path.length)(1)) - 1e-12)
    // greedy per-day emission-only labels as a third challenger
    assert(decoded >= ll(obs) - 1e-12,
      "Viterbi must not lose to the emission-greedy path")
    // obs column really is the above-mean indicator of the fixture
    val counts = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .orderBy("day").select("c").collect().map(_.getLong(0))
    val n = counts.length; val tot = counts.sum
    assert(obs.toSeq == counts.map(c => if (c * n > tot) 1 else 0).toSeq)
  }

  test("llm_budget_select: selection fits the budget and never exceeds counts") {
    val rows = q("llm_budget_select").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "selected <= docs per source")
      assert(r.getLong(3) >= 0)
    }
    val totalTokens = Tables.documents(spark, TestSpark.sf0001)
      .select(functions.TextUdfs.tokenizeCol(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .agg(sum(size(col("t")).cast("long"))).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum <= totalTokens / 4,
      "greedy prefix must respect the token budget")
    assert(rows.map(_.getLong(2)).sum > 0, "budget must admit some docs")
  }

  test("ts_kaplan_meier: survival monotone, risk set shrinking, bounded") {
    val rows = q("ts_kaplan_meier").orderBy("t").collect()
    assert(rows.nonEmpty, "fixture must yield uncensored error events")
    var lastS = 1.0 + 1e-12
    var lastRisk = Long.MaxValue
    rows.foreach { r =>
      assert(r.getLong(2) >= 1, "emitted rows are death times")
      assert(r.getLong(1) < lastRisk, "risk set strictly shrinks")
      lastRisk = r.getLong(1)
      val sv = r.getDouble(4)
      // S hits exactly 0 when the largest observed time is a death
      assert(sv >= 0.0 && sv <= lastS,
        s"survival must be non-increasing: $sv")
      lastS = sv
    }
    val nUsers = Tables.events(spark, TestSpark.sf0001)
      .select("user_id").distinct().count()
    assert(rows.head.getLong(1) <= nUsers)
  }

  test("stat_logrank_test: variance positive, |z| finite, counts bounded") {
    val r = q("stat_logrank_test").head()
    assert(r.getLong(0) >= 1)
    assert(r.getDouble(2) > 0.0, "pooled hypergeometric variance positive")
    assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    assert(math.abs(r.getDouble(3) - r.getDouble(1) /
      math.sqrt(r.getDouble(2))) < 1e-12, "z = (O-E)/sqrt(V) identity")
  }

  test("llm_bradley_terry: ratings in (0,1], max attained, deterministic") {
    val rows = q("llm_bradley_terry").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "wins <= games")
      assert(r.getLong(1) >= 1)
    }
    assert(rows.map(_.getDouble(3)).max == 1.0, "max-normalized fixed point")
    val again = q("llm_bradley_terry").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "MM fixed point must be run-to-run deterministic")
  }

  test("graph_mst_boruvka: equals a driver-side Kruskal under the same order") {
    val got = q("graph_mst_boruvka").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent reference: Kruskal with union-find on the collected
    // weighted edge list, same strict (cost, u, v) order
    val ew = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")).as("h")).distinct()
    val ok = ew.groupBy("event_type", "h").agg(count(lit(1)).as("k"))
      .filter(col("k") <= 12).drop("k")
    val af = ew.join(ok, Seq("event_type", "h"))
    val edges = af.as("a").join(af.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.h") === col("b.h") &&
          col("a.user_id") < col("b.user_id"))
      .groupBy(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .agg(count(lit(1)).as("shared")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = scala.collection.mutable.Set[(Long, Long, Long)]()
    edges.sortBy { case (u, v, sh) => (-sh, u, v) }.foreach {
      case (u, v, sh) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { parent(ru) = rv; kruskal += ((u, v, sh)) }
    }
    assert(got == kruskal.toSet,
      s"Boruvka forest (${got.size} edges) must equal Kruskal " +
        s"(${kruskal.size} edges) under the shared total order")
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(got.size <= nodes.length - 1, "forest bound")
  }

  test("stat_mcnemar and stat_power_twoprop: closed forms hold") {
    val m = q("stat_mcnemar").head()
    val (n10, n01) = (m.getLong(0), m.getLong(1))
    assert(m.getDouble(2) ==
      ((n10 - n01) * (n10 - n01)).toDouble / (n10 + n01))
    assert(m.getDouble(3) <= m.getDouble(2) + 1e-12,
      "continuity correction cannot increase chi2")
    val p = q("stat_power_twoprop").orderBy("mde_rel").collect()
    assert(p.length == 3)
    // larger MDE -> smaller required n, strictly
    assert(p(0).getLong(4) > p(1).getLong(4))
    assert(p(1).getLong(4) > p(2).getLong(4))
    p.foreach(r => assert(r.getLong(4) >= 1))
  }

  test("ds_typed_flatmap: per-status top-2 matches the columnar window") {
    val rows = q("ds_typed_flatmap").collect()
    val byStatus = rows.groupBy(_.getString(0))
    byStatus.foreach { case (_, rs) =>
      assert(rs.length <= 2)
      if (rs.length == 2) {
        val Array(a, b) = rs.sortBy(_.getLong(1))
        assert(a.getDouble(3) > b.getDouble(3) ||
          (a.getDouble(3) == b.getDouble(3) &&
            a.getLong(2) < b.getLong(2)), "rank order respects total order")
      }
    }
    val direct = Tables.orders(spark, TestSpark.sf0001)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 2)
      .select("o_orderstatus", "rn", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2))).toSet
    assert(rows.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet == direct)
  }

  test("fn_geohash_encode: matches the classic alternating-bisection encoder") {
    val rows = q("fn_geohash_encode").collect()
    assert(rows.nonEmpty)
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    // independent reference: textbook alternating interval bisection
    def ref(lat: Double, lon: Double): String = {
      var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
      var even = true
      val bits = (0 until 40).map { _ =>
        val b = if (even) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { lonLo = mid; 1 } else { lonHi = mid; 0 }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { latLo = mid; 1 } else { latHi = mid; 0 }
        }
        even = !even
        b
      }
      bits.grouped(5).map(g =>
        alpha(g.foldLeft(0)((a, b) => a * 2 + b))).mkString
    }
    var checked = 0
    rows.foreach { r =>
      val (lat, lon, gh) = (r.getDouble(1), r.getDouble(2), r.getString(4))
      // quantization floor and bisection agree except exactly on cell
      // boundaries; fixture coords are 0.01-degree grid points, never
      // within double-eps of a 2^-20 cell edge
      assert(gh == ref(lat, lon), s"($lat,$lon): $gh != ${ref(lat, lon)}")
      checked += 1
    }
    assert(checked == rows.length)
  }

  test("ts_growth_accounting: both accounting identities hold exactly") {
    val rows = q("ts_growth_accounting").orderBy("day").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"${r.get(0)}: DAU = new + retained + resurrected")
    }
    // r10: the FULL OUTER churn join guarantees day coverage is
    // gap-free (every day after an active day has activity or churn),
    // so the delta identity is asserted over EVERY adjacent pair —
    // no non-consecutive-day escape hatch.
    rows.sliding(2).foreach {
      case Array(p, c) =>
        assert(c.getDate(0).toLocalDate ==
          p.getDate(0).toLocalDate.plusDays(1),
          s"${c.get(0)}: output days must be consecutive")
        assert(c.getLong(1) - p.getLong(1) ==
          c.getLong(2) + c.getLong(4) - c.getLong(5),
          s"${c.get(0)}: dDAU = new + resurrected - churned")
      case _ => ()
    }
    // the final row is the day after the last active day: pure churn
    val last = rows.last
    assert(last.getLong(1) == 0 && last.getLong(5) > 0,
      "trailing row must be the zero-DAU churn-out day")
  }

  test("fn_ulid_sortable: lexicographic id order preserves time order") {
    val rows = q("fn_ulid_sortable").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(2).length == 26))
    val byUlid = rows.sortBy(_.getString(2)).map(_.getLong(1))
    byUlid.sliding(2).foreach {
      case Array(a, b) => assert(a <= b,
        "sorting by ULID must sort by timestamp")
      case _ => ()
    }
    // reproducible: same inputs, same ids
    val again = q("fn_ulid_sortable").collect().map(_.getString(2)).toSeq
    assert(again == rows.map(_.getString(2)).toSeq)
  }

  test("stat_odds_ratio: OR consistent with cells and CI brackets it") {
    val r = q("stat_odds_ratio").head()
    val (a, b, c, d) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // odds_ratio ships ROUND(·,6) since r10 (Haldane-guarded path)
    assert(math.abs(r.getDouble(4) - (a * d).toDouble / (b * c)) <= 5e-7)
    assert(r.getDouble(5) <= r.getDouble(4) &&
      r.getDouble(4) <= r.getDouble(6), "CI must bracket the estimate")
  }

  test("llm_quality_auc: equals the brute-force pairwise probability") {
    val r = q("llm_quality_auc").head()
    val (n1, n0, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(auc >= 0.0 && auc <= 1.0)
    // brute force on the fixture: P(q_pos > q_neg) + 0.5 P(tie)
    val docs = graft.api.TextMetrics
      .quality(Tables.documents(spark, TestSpark.sf0001), "doc_id", "text",
        Seq("the", "a", "of", "and", "to", "in"))
      .select(col("doc_id"), col("n_chars"),
        (col("quality") * 10000).cast("long").as("qd"), col("quality"))
      .collect()
      .map(x => (math.round(x.getDouble(3) * 10000), x.getLong(1) >= 200))
    val pos = docs.filter(_._2).map(_._1)
    val neg = docs.filterNot(_._2).map(_._1)
    assert(pos.length.toLong == n1 && neg.length.toLong == n0)
    var wins2 = 0L // doubled: win=2, tie=1
    for (p <- pos; n <- neg)
      wins2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val brute = wins2.toDouble / (2.0 * n1 * n0)
    assert(math.abs(auc - brute) < 1e-12, s"AUC $auc vs brute $brute")
  }

  test("llm_submodular_coverage: gains non-increasing, coverage conserved") {
    val rows = q("llm_submodular_coverage").orderBy("round").collect()
    assert(rows.length == 5)
    val gains = rows.map(_.getLong(2))
    gains.sliding(2).foreach {
      case Array(a, b) => assert(a >= b,
        "greedy marginal gains must be non-increasing (submodularity)")
      case _ => ()
    }
    // covered-count telescopes to the sum of gains
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(3) == gains.take(i + 1).sum,
        s"round ${i + 1}: coverage must equal the gain telescope")
    }
    assert(rows.map(_.getLong(1)).distinct.length == 5,
      "five distinct documents selected")
  }

  test("ts_pareto_days: frontier is mutually undominated and covers the rest") {
    val front = q("ts_pareto_days").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(front.nonEmpty)
    val all = Tables.events(spark, TestSpark.sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("p"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def dom(b: (Long, Long), a: (Long, Long)) =
      b._1 >= a._1 && b._2 <= a._2 && (b._1 > a._1 || b._2 < a._2)
    for (a <- front; b <- front)
      assert(!dom(b, a), s"frontier member $a dominated by $b")
    val frontSet = front.toSet
    all.filterNot(frontSet.contains).foreach { a =>
      assert(front.exists(f => dom(f, a)),
        s"non-frontier day $a must be dominated by a frontier day")
    }
  }

  test("dq_observe_gate: gate boolean consistent with its own metrics row") {
    val r = q("dq_observe_gate").head()
    val expected = r.getLong(0) >= 1000 && r.getLong(1) == 0 &&
      r.getLong(3) >= 24
    assert(r.getBoolean(4) == expected)
    assert(r.getDouble(2) > 0.0)
  }
}
