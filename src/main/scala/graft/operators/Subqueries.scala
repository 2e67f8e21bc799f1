package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.L (round 3) — SQL subquery surfaces: correlated EXISTS, IN, and
  * correlated scalar subqueries, expressed through `spark.sql` so the
  * analyzer/optimizer rewrite pipeline (`RewritePredicateSubquery`,
  * `DecorrelateInnerQuery`, `RewriteCorrelatedScalarSubquery`) is the
  * code under test, not a hand-built join.
  *
  * Scale notes: Catalyst rewrites all three into joins (semi join for
  * EXISTS/IN, left outer + aggregate for the scalar), so the 100 TB
  * story is the same as §2.C — shuffled or broadcast equi-joins, no
  * nested-loop re-execution per outer row. The exact same SQL text runs
  * in DuckDB as the oracle.
  */
object Subqueries {

  /** Register the fixture tables this module's SQL references. */
  private def views(s: SparkSession, d: String): Unit = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.nation(s, d).createOrReplaceTempView("nation")
  }

  private def sqlQ(name: String, sql: String): Q =
    Q(name, (s, d) => { views(s, d); s.sql(sql) }, Some(sql))

  val queries: Seq[Q] = Seq(
    // Correlated EXISTS → rewritten to a left-semi join
    sqlQ("sql_exists_subquery",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin),

    // IN + correlated NOT EXISTS (semi + anti in one query)
    sqlQ("sql_in_subquery",
      """SELECT p_partkey, p_name FROM part p
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem
        |                    WHERE l_shipdate > TIMESTAMP '2001-06-01 00:00:00')
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_partkey = p.p_partkey
        |                    AND l.l_quantity > 49)
        |ORDER BY p_partkey""".stripMargin),

    // Correlated scalar subqueries → left outer join + aggregate per
    // correlation key (exact COUNT/MAX — no float drift)
    sqlQ("sql_scalar_subquery",
      """SELECT n_name,
        |  (SELECT COUNT(*) FROM customer c
        |   WHERE c.c_nationkey = n.n_nationkey) AS n_customers,
        |  (SELECT MAX(o.o_orderkey) FROM orders o, customer c2
        |   WHERE c2.c_nationkey = n.n_nationkey
        |     AND o.o_custkey = c2.c_custkey) AS max_orderkey
        |FROM nation n ORDER BY n_name""".stripMargin),

    // Correlated LATERAL with ORDER BY + LIMIT: top-2 orders per
    // customer as a lateral table function. Catalyst decorrelates the
    // per-row LIMIT into a window (rank ≤ 2 over a single shuffle) —
    // the declarative form of topk_per_group.
    sqlQ("join_lateral_topn",
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin),

    // Aggregate FILTER clause: per-group conditional aggregation
    // without a self-join or CASE pyramid; identical syntax both
    // engines. Decimal-domain sums per §7.4.
    sqlQ("agg_filtered",
      """SELECT o_orderstatus,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS sum_urgent
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // Recursive CTE (Spark 4 WITH RECURSIVE): walk each customer's
    // order sequence link-by-link, accumulating spend in exact decimal.
    // Iterations = chain depth, and EACH iteration is a serialized job
    // that re-evaluates the anchor subplan (Spark does not materialize
    // it across rounds — measured 16.6 s unbounded at sf0.1), so the
    // walk is bounded: a 10% customer cohort, first 6 links. Types are
    // pinned DECIMAL(18,2) in both arms (a recursive union must be
    // type-stable in both engines). This is the iterative-join shape
    // nearDupComponents hand-builds; the hand-built loop's
    // localCheckpoint-per-round is exactly the materialization the SQL
    // surface lacks — which is why the components implementation stays
    // a loop and this stays a bounded demo.
    sqlQ("sql_recursive_cte",
      """WITH RECURSIVE seq AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
        |           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |    FROM orders WHERE o_custkey % 10 = 0) t WHERE rn <= 6),
        |walk AS (
        |  SELECT o_custkey, o_orderkey, rn, p AS cum FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.o_custkey, s.o_orderkey, s.rn, CAST(w.cum + s.p AS DECIMAL(18,2))
        |  FROM walk w JOIN seq s ON s.o_custkey = w.o_custkey AND s.rn = w.rn + 1)
        |SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn, CAST(cum AS DOUBLE) AS cum_spend
        |FROM walk ORDER BY o_custkey, rn""".stripMargin),

    // listagg (Spark 4) with DISTINCT + WITHIN GROUP ordering — the
    // ordered string-aggregation surface; DuckDB's string_agg with
    // ORDER BY is the exact twin.
    Q("agg_listagg",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderstatus,
                |listagg(DISTINCT o_orderpriority, '|')
                |  WITHIN GROUP (ORDER BY o_orderpriority) AS priorities
                |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus,
             |string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // RANGE frame bounded by a time INTERVAL (vs win_range_frame's
    // integer-epoch form): trailing-1h event count directly over the
    // timestamp column. Both engines compare at microsecond precision
    // (Spark's ts is ns→µs-truncated at read; the oracle truncates via
    // date_trunc so frame boundaries agree exactly).
    Q("win_range_interval",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("events")
        s.sql("""SELECT event_id,
                |count(*) OVER (PARTITION BY user_id ORDER BY ts
                |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n
                |FROM events ORDER BY event_id""".stripMargin)
      },
      Some("""SELECT event_id,
             |CAST(count(*) OVER (PARTITION BY user_id ORDER BY date_trunc('microseconds', ts)
             |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n
             |FROM events ORDER BY event_id""".stripMargin)),

    // GROUP BY ALL (Spark 3.4+ / DuckDB): every non-aggregate select
    // item becomes a grouping key — the analyst-ergonomics surface that
    // removes the classic copy-the-select-list-into-group-by failure
    // mode. Same text both engines; the physical plan is the ordinary
    // hash aggregate, so nothing changes at scale. Decimal-domain money
    // per §7.4.
    // Named WINDOW clause (r12) — the parser surface none of the
    // function-form window queries exercise: two window functions
    // SHARING one named spec (one sort, one frame — the planner must
    // recognize the shared spec, not re-sort per function). Identical
    // SQL text runs in both engines.
    sqlQ("sql_named_window",
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, rn""".stripMargin),

    sqlQ("sql_group_by_all",
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),

    // SQL PIVOT syntax (r10) — the parser surface agg_pivot's
    // DataFrame API does not exercise: two aggregates fanned across
    // the explicit status list with value aliases. Spark leaves a
    // pivot cell NULL when no rows land in it (even for COUNT), so
    // the count columns are COALESCE'd to 0 on BOTH sides (the
    // agg_pivot na.fill device); the revenue columns stay NULL-able
    // and exact (DECIMAL sum cast once to double). Same single hash
    // aggregate as any pivot at scale.
    Q("sql_pivot",
      (s, d) => { views(s, d); s.sql(
        """SELECT o_orderpriority,
          |  COALESCE(st_o_n, 0) AS st_o_n, st_o_rev,
          |  COALESCE(st_f_n, 0) AS st_f_n, st_f_rev,
          |  COALESCE(st_p_n, 0) AS st_p_n, st_p_rev
          |FROM (
          |  SELECT * FROM (
          |    SELECT o_orderpriority, o_orderstatus, o_totalprice
          |    FROM orders)
          |  PIVOT (
          |    COUNT(*) AS n,
          |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |      AS rev
          |    FOR o_orderstatus IN ('O' AS st_o, 'F' AS st_f,
          |      'P' AS st_p)))
          |ORDER BY o_orderpriority""".stripMargin) },
      Some("""SELECT o_orderpriority,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS st_o_n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS st_o_rev,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS st_f_n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS st_f_rev,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS st_p_n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |    FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS st_p_rev
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // SQL UNPIVOT syntax (r10) — agg_unpivot's parser twin: wide
    // metric columns to long (metric, val) rows through the
    // ANSI-style UNPIVOT clause; the oracle is the UNION ALL
    // expansion. Values pre-cast to one double type (UNPIVOT requires
    // a common value type). Row-multiplying projection, no shuffle.
    Q("sql_unpivot",
      (s, d) => { views(s, d); s.sql(
        """SELECT o_orderkey, metric, val FROM (
          |  SELECT o_orderkey,
          |    CAST(o_totalprice AS DOUBLE) AS price,
          |    CAST(o_custkey AS DOUBLE) AS cust
          |  FROM orders)
          |UNPIVOT (val FOR metric IN (price, cust))
          |ORDER BY o_orderkey, metric""".stripMargin) },
      Some("""SELECT o_orderkey, 'price' AS metric,
             |  CAST(o_totalprice AS DOUBLE) AS val FROM orders
             |UNION ALL
             |SELECT o_orderkey, 'cust', CAST(o_custkey AS DOUBLE)
             |FROM orders
             |ORDER BY o_orderkey, metric""".stripMargin))
  )
}
