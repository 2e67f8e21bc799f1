package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.L (round-11 waves) — classical-test depth: variance homogeneity,
  * rank post-hoc, ordered-alternative trend, and paired-categorical
  * symmetry. House rules throughout: exact integer/decimal moments for
  * as long as algebra allows, doubles only behind the final
  * `round(…, 4)`, and any sum of per-group DOUBLES folds in explicit
  * key order on both engines (sort_array+aggregate ↔
  * `list_sum(list(x ORDER BY k))`) so float association cannot differ.
  */
object Stats2 {

  val queries: Seq[Q] = Seq(

    // Bartlett's test for homogeneity of variances of extendedprice
    // across return flags: per-group (n, Σx, Σx²) accumulate as EXACT
    // DECIMAL (associative at any partitioning — one linear aggregate
    // over the fact at any scale), group count k is flag-bounded, and
    // the ln-variance terms — the only doubles — fold in FLAG ORDER on
    // both engines. T = [(N−k)·ln Sp² − Σ(nᵢ−1)·ln Sᵢ²] / C,
    // C = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1)).
    Q("stat_bartlett",
      (s, d) => {
        val g = Tables.lineitem(s, d)
          .select(col("l_returnflag").as("f"),
            col("l_extendedprice").cast("decimal(18,2)").as("x"))
          .groupBy("f")
          .agg(count(lit(1)).as("ng"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sx2"))
          .withColumn("s2",
            (col("sx2").cast("double") - col("sx").cast("double") *
              col("sx").cast("double") / col("ng").cast("double")) /
              (col("ng") - 1).cast("double"))
        val folded = g.agg(
          count(lit(1)).as("k"), sum("ng").cast("long").as("n"),
          sum(col("sx2")).as("sx2all"),
          expr("aggregate(sort_array(collect_list(struct(f AS k, " +
            "(ng - 1) * ln(s2) AS v))), cast(0.0 as double), " +
            "(acc, e) -> acc + e.v)").as("sln"),
          expr("aggregate(sort_array(collect_list(struct(f AS k, " +
            "1.0 / (ng - 1) AS v))), cast(0.0 as double), " +
            "(acc, e) -> acc + e.v)").as("sinv"),
          // pooled within-group SS in exact decimal needs Σ(sx²/ng) —
          // a rational; fold it as double in flag order instead
          expr("aggregate(sort_array(collect_list(struct(f AS k, " +
            "cast(sx as double) * cast(sx as double) / ng AS v))), " +
            "cast(0.0 as double), (acc, e) -> acc + e.v)").as("sqn"))
        folded.select(col("k"), col("n"),
          round({
            val nk = (col("n") - col("k")).cast("double")
            val sp2 = (col("sx2all").cast("double") - col("sqn")) / nk
            val t = (nk * log(sp2) - col("sln")) /
              (lit(1.0) + (col("sinv") - lit(1.0) / nk) /
                (lit(3.0) * (col("k") - 1).cast("double")))
            t
          }, 4).as("bartlett_t"))
      },
      Some("""WITH g AS (
             |  SELECT l_returnflag AS f, COUNT(*) AS ng,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sx2
             |  FROM lineitem GROUP BY 1),
             |g2 AS (
             |  SELECT f, ng, sx, sx2,
             |    (CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)
             |      * CAST(sx AS DOUBLE) / CAST(ng AS DOUBLE))
             |      / CAST(ng - 1 AS DOUBLE) AS s2
             |  FROM g),
             |m AS (
             |  SELECT COUNT(*) AS k, CAST(SUM(ng) AS BIGINT) AS n,
             |    SUM(sx2) AS sx2all,
             |    list_sum(list((ng - 1) * ln(s2) ORDER BY f)) AS sln,
             |    list_sum(list(1.0 / (ng - 1) ORDER BY f)) AS sinv,
             |    list_sum(list(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / ng
             |      ORDER BY f)) AS sqn
             |  FROM g2)
             |SELECT k, n,
             |  ROUND(((CAST(n - k AS DOUBLE)
             |      * ln((CAST(sx2all AS DOUBLE) - sqn)
             |            / CAST(n - k AS DOUBLE)) - sln))
             |    / (1.0 + (sinv - 1.0 / CAST(n - k AS DOUBLE))
             |        / (3.0 * CAST(k - 1 AS DOUBLE))), 4) AS bartlett_t
             |FROM m""".stripMargin)),

    // Dunn's post-hoc test after Kruskal–Wallis, from the BOUNDED
    // quantity domain's frequency table (the stat_spearman device):
    // global doubled midranks 2r̄ᵥ = 2·cumbᵥ + cntᵥ + 1 stay exact
    // integers, per-flag doubled rank sums Sᵢ = Σᵥ cnt_iv·2r̄ᵥ are
    // exact, the tie term Σ(t³−t) is exact, and each pairwise
    // z = (R̄ᵢ−R̄ⱼ)/√((N(N+1)/12 − T/(12(N−1)))·(1/nᵢ+1/nⱼ)) is one
    // closed-form double per flag pair. Everything after the single
    // fact aggregate is domain-sized (≤ flags×50 cells, 3 pairs).
    Q("stat_dunn_test",
      (s, d) => {
        val fq = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag").as("f"), col("l_quantity").as("q"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val byV = fq.groupBy("q").agg(sum("cnt").as("cv"))
          .withColumn("cumb", coalesce(sum("cv").over(
            Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .withColumn("r2", col("cumb") * 2 + col("cv") + 1)
        val perF = fq.join(byV.select("q", "r2"), "q")
          .groupBy("f")
          .agg(sum("cnt").cast("long").as("ng"),
            sum(col("cnt").cast("decimal(18,0)") *
              col("r2").cast("decimal(18,0)")).as("s2r"))
        val scal = byV.agg(sum("cv").cast("long").as("nn"),
          sum(col("cv") * col("cv") * col("cv") - col("cv"))
            .cast("long").as("ties"))
        val a = perF.select(col("f").as("fa"), col("ng").as("na"),
          col("s2r").as("sa"))
        val b = perF.select(col("f").as("fb"), col("ng").as("nb"),
          col("s2r").as("sb"))
        a.join(b, col("fa") < col("fb")).crossJoin(broadcast(scal))
          .select(col("fa").as("flag_a"), col("fb").as("flag_b"),
            round({
              val ra = col("sa").cast("double") /
                (lit(2.0) * col("na").cast("double"))
              val rb = col("sb").cast("double") /
                (lit(2.0) * col("nb").cast("double"))
              val nn = col("nn").cast("double")
              val v = (nn * (nn + 1) / 12.0 -
                col("ties").cast("double") / (lit(12.0) * (nn - 1))) *
                (lit(1.0) / col("na").cast("double") +
                  lit(1.0) / col("nb").cast("double"))
              (ra - rb) / sqrt(v)
            }, 4).as("dunn_z"))
          .orderBy("flag_a", "flag_b")
      },
      Some("""WITH fq AS (
             |  SELECT l_returnflag AS f, l_quantity AS q, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2),
             |byv AS (
             |  SELECT q, SUM(cnt) AS cv,
             |    2 * COALESCE(SUM(SUM(cnt)) OVER (ORDER BY q
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + SUM(cnt) + 1 AS r2
             |  FROM fq GROUP BY q),
             |perf AS (
             |  SELECT f, CAST(SUM(cnt) AS BIGINT) AS ng,
             |    SUM(CAST(cnt AS DECIMAL(18,0))
             |      * CAST(r2 AS DECIMAL(18,0))) AS s2r
             |  FROM fq JOIN byv USING (q) GROUP BY f),
             |scal AS (
             |  SELECT CAST(SUM(cv) AS BIGINT) AS nn,
             |    CAST(SUM(cv * cv * cv - cv) AS BIGINT) AS ties
             |  FROM byv)
             |SELECT a.f AS flag_a, b.f AS flag_b,
             |  ROUND((CAST(a.s2r AS DOUBLE) / (2.0 * a.ng)
             |      - CAST(b.s2r AS DOUBLE) / (2.0 * b.ng))
             |    / sqrt((CAST(nn AS DOUBLE) * (nn + 1) / 12.0
             |        - CAST(ties AS DOUBLE) / (12.0 * (nn - 1)))
             |      * (1.0 / a.ng + 1.0 / b.ng)), 4) AS dunn_z
             |FROM perf a JOIN perf b ON a.f < b.f, scal
             |ORDER BY flag_a, flag_b""".stripMargin)),

    // Page's L test for ORDERED alternatives — the monotone-trend
    // cousin of stat_friedman on the same complete-week blocks: within
    // each week the 7 day-of-week revenues are ranked (row_number with
    // the (rev, dow) tiebreak — deterministic), L = Σ_dow (dow+1)·R_dow
    // is an exact integer, and z = (L − b·k(k+1)²/4) /
    // √(b·k²(k+1)(k²−1)/144) is one closed-form double. Block count b
    // is calendar-bounded; everything after the daily aggregate is
    // week-sized at any scale.
    Q("stat_page_trend",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .withColumn("__epoch",
            datediff(col("o_orderdate").cast("date"),
              lit("1970-01-01").cast("date")).cast("long"))
          .groupBy((col("__epoch") / 7).cast("long").as("wk"),
            pmod(col("__epoch"), lit(7)).as("dow"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        val complete = daily.groupBy("wk")
          .agg(count(lit(1)).as("k")).filter(col("k") === 7).select("wk")
        val ranked = daily.join(complete, "wk")
          .withColumn("r", row_number().over(
            Window.partitionBy("wk").orderBy(col("rev"), col("dow"))))
        val rsum = ranked.groupBy("dow")
          .agg(sum(col("r").cast("long")).as("rj"), count(lit(1)).as("b"))
        rsum.agg(max("b").cast("long").as("b"),
            sum((col("dow") + 1) * col("rj")).cast("long").as("l_stat"))
          .select(col("b"), col("l_stat"),
            round((col("l_stat").cast("double") -
              col("b").cast("double") * lit(7.0) * lit(64.0) / lit(4.0)) /
              sqrt(col("b").cast("double") * lit(49.0) * lit(8.0) *
                lit(48.0) / lit(144.0)), 4).as("page_z"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(FLOOR(CAST(date_diff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS DOUBLE) / 7) AS BIGINT)
             |      AS wk,
             |    date_diff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) % 7 AS dow,
             |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
             |  FROM orders GROUP BY 1, 2),
             |complete AS (
             |  SELECT wk FROM daily GROUP BY wk HAVING COUNT(*) = 7),
             |ranked AS (
             |  SELECT d.wk, d.dow,
             |    ROW_NUMBER() OVER (PARTITION BY d.wk
             |      ORDER BY d.rev, d.dow) AS r
             |  FROM daily d JOIN complete c USING (wk)),
             |rsum AS (
             |  SELECT dow, CAST(SUM(r) AS BIGINT) AS rj, COUNT(*) AS b
             |  FROM ranked GROUP BY dow),
             |m AS (
             |  SELECT CAST(MAX(b) AS BIGINT) AS b,
             |    CAST(SUM((dow + 1) * rj) AS BIGINT) AS l_stat
             |  FROM rsum)
             |SELECT b, l_stat,
             |  ROUND((CAST(l_stat AS DOUBLE) - CAST(b AS DOUBLE)
             |      * 7.0 * 64.0 / 4.0)
             |    / sqrt(CAST(b AS DOUBLE) * 49.0 * 8.0 * 48.0 / 144.0),
             |    4) AS page_z
             |FROM m""".stripMargin)),

    // Bowker's symmetry test on the paired categorical transition
    // (first event type → last event type) per user: the k×k table is
    // key-bounded, χ² = Σ_{i<j} (n_ij − n_ji)²/(n_ij + n_ji) over
    // present pairs, df = #pairs with n_ij + n_ji > 0. First/last are
    // deterministic under the (ts, event_id) total order. The per-pair
    // χ² terms are doubles summed in (i,j) order on both engines.
    Q("stat_bowker_symmetry",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val wd = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        val fl = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"),
            row_number().over(w).as("ra"), row_number().over(wd).as("rb"))
        val pairs = fl.filter(col("ra") === 1)
          .select(col("user_id"), col("event_type").as("first_et"))
          .join(fl.filter(col("rb") === 1)
            .select(col("user_id"), col("event_type").as("last_et")),
            "user_id")
          .groupBy("first_et", "last_et").agg(count(lit(1)).as("n"))
        val aa = pairs.select(col("first_et").as("i"), col("last_et").as("j"),
          col("n").as("nij"))
        val bb = pairs.select(col("first_et").as("j2"), col("last_et").as("i2"),
          col("n").as("nji"))
        val terms = aa.join(bb,
            col("i") === col("i2") && col("j") === col("j2"), "full_outer")
          .select(coalesce(col("i"), col("i2")).as("i"),
            coalesce(col("j"), col("j2")).as("j"),
            coalesce(col("nij"), lit(0L)).as("nij"),
            coalesce(col("nji"), lit(0L)).as("nji"))
          .filter(col("i") < col("j"))
        terms.agg(count(lit(1)).cast("long").as("df"),
            expr("aggregate(sort_array(collect_list(struct(i, j, " +
              "cast((nij - nji) * (nij - nji) as double) / (nij + nji) " +
              "AS v))), cast(0.0 as double), (acc, e) -> acc + e.v)")
              .as("chi2"))
          .select(col("df"), round(col("chi2"), 4).as("bowker_chi2"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_type, ts, event_id,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS ra,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rb
             |  FROM events),
             |fl AS (
             |  SELECT a.user_id, a.event_type AS first_et,
             |    b.event_type AS last_et
             |  FROM (SELECT user_id, event_type FROM o WHERE ra = 1) a
             |  JOIN (SELECT user_id, event_type FROM o WHERE rb = 1) b
             |    USING (user_id)),
             |tab AS (
             |  SELECT first_et, last_et, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM fl GROUP BY 1, 2),
             |terms AS (
             |  SELECT COALESCE(a.first_et, b.last_et) AS i,
             |    COALESCE(a.last_et, b.first_et) AS j,
             |    COALESCE(a.n, 0) AS nij, COALESCE(b.n, 0) AS nji
             |  FROM tab a FULL OUTER JOIN tab b
             |    ON a.first_et = b.last_et AND a.last_et = b.first_et
             |  WHERE COALESCE(a.first_et, b.last_et)
             |      < COALESCE(a.last_et, b.first_et)),
             |m AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS df,
             |    list_sum(list(CAST((nij - nji) * (nij - nji) AS DOUBLE)
             |      / (nij + nji) ORDER BY i, j)) AS chi2
             |  FROM terms)
             |SELECT df, ROUND(chi2, 4) AS bowker_chi2 FROM m""".stripMargin))
  )
}
