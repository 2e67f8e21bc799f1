package graft.operators

import graft.{Q, Tables}
import graft.functions.TextUdfs
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.L (round-11 Wave 36) — model/retrieval evaluation metrics that
  * close out the ranking-eval and calibration families: rank-based
  * retrieval scores (MRR / recall@k / MAP) over the same BM25-style
  * candidate pools `llm_ndcg_retrieval` ranks, and the Murphy
  * decomposition of the Brier score over the same 10 calibration bins
  * `llm_calibration_bins` builds. House rules: exact integer counts
  * for as long as algebra allows, per-term doubles rounded to 9dp and
  * summed as DECIMAL (order-free exact), `round(…, 6)` on the final
  * ratios, deterministic (score DESC, doc_id) tie-breaks mirrored
  * textually in the oracle.
  */
object Evals {

  private val SQL_TOKENS =
    s"SELECT doc_id, unnest(${TextUdfs.SQL_TOKENIZE}) AS token " +
      "FROM documents"

  val queries: Seq[Q] = Seq(

    // Retrieval eval per query term: MRR@10, recall@5 and MAP@10 over
    // term-frequency-ranked candidate lists (relevance proxy tf >= 3 —
    // binary judgments, where llm_ndcg_retrieval's graded rel counts
    // matched TERMS). Scale shape: the candidate pool per query term
    // is df-bounded, the rank window partitions BY TERM (each
    // partition sorts only its own postings — the classic per-query
    // scatter-gather), and every metric folds from integer cumulative
    // counts: precision@i = cumrel/i is rounded to 9dp and
    // decimal-summed in rank order so MAP is bit-identical across
    // engines and partitionings.
    Q("llm_mrr_recall",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(TextUdfs.tokenizeCol(col("text"))).as("token"))
        val tf = tok
          .filter(col("token").isin("spark", "query", "window"))
          .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
        val wr = Window.partitionBy("token")
          .orderBy(col("tf").desc, col("doc_id"))
        val ranked = tf
          .withColumn("rnk", row_number().over(wr))
          .withColumn("rel", when(col("tf") >= 3, 1L).otherwise(0L))
        val totals = ranked.groupBy("token")
          .agg(sum("rel").cast("long").as("n_rel"))
        val top = ranked.filter(col("rnk") <= 10)
          .withColumn("cumrel", sum("rel").over(
            wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val m = top.groupBy("token").agg(
          min(when(col("rel") === 1L, col("rnk"))).as("first_rel"),
          sum(when(col("rel") === 1L,
            round(col("cumrel").cast("double") / col("rnk"), 9)
              .cast("decimal(28,9)"))).as("ap_num"),
          sum(when(col("rel") === 1L && col("rnk") <= 5, 1L)
            .otherwise(0L)).as("rel5"))
        m.join(totals, "token")
          .select(col("token"), col("n_rel"),
            round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6)
              .as("mrr10"),
            // NULLIF zero guards (r12 ADVICE): a probe token with zero
            // relevant docs divides by 0 — Spark non-ANSI yields NULL
            // but DuckDB IEEE float division yields inf/NaN; nullif on
            // BOTH sides makes the engines agree (NULL) on that edge.
            round(col("rel5").cast("double") /
              nullif(col("n_rel"), lit(0L)).cast("double"), 6)
              .as("recall5"),
            round(coalesce(col("ap_num").cast("double"), lit(0.0)) /
              nullif(least(col("n_rel"), lit(10L)), lit(0L)).cast("double"),
              6).as("map10"))
          .orderBy("token")
      },
      Some(s"""WITH tok AS ($SQL_TOKENS),
              |tf AS (
              |  SELECT token, doc_id, COUNT(*) AS tf FROM tok
              |  WHERE token IN ('spark', 'query', 'window')
              |  GROUP BY 1, 2),
              |ranked AS (
              |  SELECT token, doc_id, tf,
              |    row_number() OVER (PARTITION BY token
              |      ORDER BY tf DESC, doc_id) AS rnk,
              |    CASE WHEN tf >= 3 THEN 1 ELSE 0 END AS rel
              |  FROM tf),
              |totals AS (
              |  SELECT token, CAST(SUM(rel) AS BIGINT) AS n_rel
              |  FROM ranked GROUP BY 1),
              |top AS (
              |  SELECT token, rnk, rel,
              |    SUM(rel) OVER (PARTITION BY token
              |      ORDER BY tf DESC, doc_id
              |      ROWS UNBOUNDED PRECEDING) AS cumrel
              |  FROM ranked WHERE rnk <= 10),
              |m AS (
              |  SELECT token,
              |    MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
              |    SUM(CASE WHEN rel = 1 THEN CAST(ROUND(
              |      CAST(cumrel AS DOUBLE) / rnk, 9) AS DECIMAL(28,9))
              |      END) AS ap_num,
              |    CAST(SUM(CASE WHEN rel = 1 AND rnk <= 5
              |      THEN 1 ELSE 0 END) AS BIGINT) AS rel5
              |  FROM top GROUP BY token)
              |SELECT m.token, n_rel,
              |  ROUND(COALESCE(1.0 / first_rel, 0.0), 6) AS mrr10,
              |  ROUND(CAST(rel5 AS DOUBLE) / NULLIF(n_rel, 0), 6)
              |    AS recall5,
              |  ROUND(COALESCE(CAST(ap_num AS DOUBLE), 0.0)
              |    / NULLIF(LEAST(n_rel, 10), 0), 6) AS map10
              |FROM m JOIN totals USING (token)
              |ORDER BY token""".stripMargin)),

    // Murphy decomposition of the Brier score for the quality-gate
    // "kept" forecast: BS = mean((p - o)^2) with p = the 4dp quality
    // score and o = the keep decision, decomposed over the 10
    // calibration bins into reliability - resolution + uncertainty.
    // The Brier numerator is EXACT integer algebra (p = y/10^4 with
    // integer y, o in {0,1} => BS = (Σy² - 2·10⁴·Σyo + 10⁸·Σo)/(10⁸n));
    // REL/RES per-bin terms are the only doubles, rounded to 9dp and
    // decimal-summed IN BIN ORDER on both engines. One linear pass for
    // the per-doc scores, one 10-row groupBy — linear at any corpus
    // size (the dup-rank window partitions by md5(text), bounded by
    // duplicate-cluster size like the calibration query it mirrors).
    Q("llm_brier_decomposition",
      (s, d) => {
        val STOP = Seq("the", "a", "of", "and", "to", "in")
        val q = graft.api.TextMetrics
          .quality(Tables.documents(s, d), "doc_id", "text", STOP)
        val wDup = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
        val lab = q
          .withColumn("dup_rn", row_number().over(wDup))
          .withColumn("o",
            when(col("n_words") >= 25 && col("n_words") <= 90 &&
              col("dup_rn") === 1 && col("quality") >= 0.75, 1L)
              .otherwise(0L))
          .withColumn("y",
            floor(col("quality") * 10000.0 + 0.5).cast("long"))
        val bins = lab
          .groupBy(least(floor(col("y") / lit(1000L)), lit(9L))
            .cast("long").as("bin"))
          .agg(count(lit(1)).as("nb"), sum("y").as("syb"),
            sum("o").as("sob"), sum(col("y") * col("y")).as("sy2b"),
            sum(col("y") * col("o")).as("syob"))
        val tot = bins.agg(
          sum("nb").cast("long").as("n"),
          sum("sy2b").cast("long").as("sy2"),
          sum("syob").cast("long").as("syo"),
          sum("sob").cast("long").as("so"),
          // per-bin REL term (syb - 10^4*sob)^2 / (10^8 * nb), 9dp,
          // folded in bin order as decimal — order-free exact
          sum(round(
            ((col("syb") - lit(10000L) * col("sob")).cast("double") *
              (col("syb") - lit(10000L) * col("sob")).cast("double")) /
              (lit(1.0e8) * col("nb").cast("double")), 9)
            .cast("decimal(28,9)")).as("rel_num"),
          // per-bin RES partial Σ nb*obar_b² = sob²/nb (obar folded
          // against the global mean after the fold)
          sum(round(col("sob").cast("double") *
            col("sob").cast("double") / col("nb").cast("double"), 9)
            .cast("decimal(28,9)")).as("res_sq"))
        val nD = col("n").cast("double")
        val obar = col("so").cast("double") / nD
        tot.select(col("n"),
          round((col("sy2").cast("double") -
            lit(2.0e4) * col("syo").cast("double") +
            lit(1.0e8) * col("so").cast("double")) / (lit(1.0e8) * nD),
            6).as("brier"),
          round(col("rel_num").cast("double") / nD, 6).as("reliability"),
          // RES = (Σ sob²/nb)/n - obar²  (König–Huygens on bin means)
          round(col("res_sq").cast("double") / nD - obar * obar, 6)
            .as("resolution"),
          round(obar * (lit(1.0) - obar), 6).as("uncertainty"))
      },
      Some(s"""WITH q AS (
              |  SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_words,
              |    floor((0.4 * least(CAST(len(t) AS DOUBLE) / 50.0, 1.0)
              |      + 0.4 * (1.0 - CAST(len(list_filter(t, x -> x IN
              |        ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
              |        / len(t))
              |      + 0.2 * least((CAST(n_letters AS DOUBLE) / len(t))
              |        / 8.0, 1.0)) * 10000.0 + 0.5) / 10000.0 AS quality
              |  FROM (SELECT doc_id, text,
              |        ${TextUdfs.SQL_TOKENIZE} AS t,
              |        length(regexp_replace(lower(text), '[^a-z]', '',
              |          'g')) AS n_letters
              |        FROM documents) x),
              |lab AS (
              |  SELECT doc_id,
              |    CAST(floor(quality * 10000.0 + 0.5) AS BIGINT) AS y,
              |    CASE WHEN n_words >= 25 AND n_words <= 90
              |      AND ROW_NUMBER() OVER (PARTITION BY md5(text)
              |            ORDER BY doc_id) = 1
              |      AND quality >= 0.75 THEN 1 ELSE 0 END AS o
              |  FROM q),
              |bins AS (
              |  SELECT LEAST(y // 1000, 9) AS bin, COUNT(*) AS nb,
              |    SUM(y) AS syb, SUM(o) AS sob, SUM(y * y) AS sy2b,
              |    SUM(y * o) AS syob
              |  FROM lab GROUP BY 1),
              |tot AS (
              |  SELECT CAST(SUM(nb) AS BIGINT) AS n,
              |    CAST(SUM(sy2b) AS BIGINT) AS sy2,
              |    CAST(SUM(syob) AS BIGINT) AS syo,
              |    CAST(SUM(sob) AS BIGINT) AS so,
              |    list_sum(list(CAST(ROUND(
              |      (CAST(syb - 10000 * sob AS DOUBLE)
              |        * CAST(syb - 10000 * sob AS DOUBLE))
              |      / (1.0e8 * nb), 9) AS DECIMAL(28,9))
              |      ORDER BY bin)) AS rel_num,
              |    list_sum(list(CAST(ROUND(
              |      CAST(sob AS DOUBLE) * CAST(sob AS DOUBLE) / nb, 9)
              |      AS DECIMAL(28,9)) ORDER BY bin)) AS res_sq
              |  FROM bins)
              |SELECT n,
              |  ROUND((CAST(sy2 AS DOUBLE) - 2.0e4 * CAST(syo AS DOUBLE)
              |    + 1.0e8 * CAST(so AS DOUBLE))
              |    / (1.0e8 * CAST(n AS DOUBLE)), 6) AS brier,
              |  ROUND(CAST(rel_num AS DOUBLE) / CAST(n AS DOUBLE), 6)
              |    AS reliability,
              |  ROUND(CAST(res_sq AS DOUBLE) / CAST(n AS DOUBLE)
              |    - (CAST(so AS DOUBLE) / CAST(n AS DOUBLE))
              |      * (CAST(so AS DOUBLE) / CAST(n AS DOUBLE)), 6)
              |    AS resolution,
              |  ROUND((CAST(so AS DOUBLE) / CAST(n AS DOUBLE))
              |    * (1.0 - CAST(so AS DOUBLE) / CAST(n AS DOUBLE)), 6)
              |    AS uncertainty
              |FROM tot""".stripMargin))
  )
}
