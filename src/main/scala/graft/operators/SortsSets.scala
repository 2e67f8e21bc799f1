package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.F + §2.G — sorts / limits / top-k and set operations.
  *
  * Scale notes: global sorts are range-partitioned (sampled bounds,
  * parallel); `orderBy.limit(k)` compiles to TakeOrderedAndProject —
  * per-partition heaps + tiny driver merge, never a full sort. Set ops
  * shuffle on the full row (distinct semantics), map-side-combined.
  */
object SortsSets {

  private def highBal(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"))
  private def building(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
  private val SQL_HIGH = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0"
  private val SQL_BLD = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"

  val queries: Seq[Q] = Seq(
    Q("sort_multikey",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc_nulls_last,
          col("o_orderkey")),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey""".stripMargin)),

    Q("topk_global",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin)),

    Q("limit_offset",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey")
        .offset(20).limit(20),
      Some("""SELECT p_partkey, p_name FROM part
             |ORDER BY p_partkey LIMIT 20 OFFSET 20""".stripMargin)),

    Q("set_union_all",
      (s, d) => highBal(s, d).unionByName(building(s, d))
        .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey FROM (($SQL_HIGH) UNION ALL ($SQL_BLD))
              |ORDER BY c_custkey""".stripMargin)),

    Q("set_union_distinct",
      (s, d) => highBal(s, d).union(building(s, d)).distinct()
        .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey FROM (($SQL_HIGH) UNION ($SQL_BLD))
              |ORDER BY c_custkey""".stripMargin)),

    // Schema-evolution union: unionByName fills columns missing on
    // either side with nulls — the reader-side story for tables whose
    // schema grew over time.
    Q("set_union_missing_cols",
      (s, d) => {
        val a = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
        val b = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
        a.unionByName(b, allowMissingColumns = true)
          .orderBy(col("o_orderkey").asc,
            col("o_totalprice").asc_nulls_last, col("o_orderpriority").asc_nulls_last)
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority FROM orders)
             |ORDER BY o_orderkey ASC, o_totalprice ASC NULLS LAST, o_orderpriority ASC NULLS LAST""".stripMargin)),

    Q("set_intersect",
      (s, d) => highBal(s, d).intersect(building(s, d))
        .orderBy("c_custkey"),
      Some(s"""($SQL_HIGH) INTERSECT ($SQL_BLD) ORDER BY c_custkey""")),

    Q("set_except",
      (s, d) => highBal(s, d).except(building(s, d))
        .orderBy("c_custkey"),
      Some(s"""($SQL_HIGH) EXCEPT ($SQL_BLD) ORDER BY c_custkey""")),

    // Multiset (bag) semantics — intersectAll keeps min(countA, countB)
    // copies of each row, exceptAll keeps countA − countB. Both plan as
    // one shuffle with a count aggregate + generate (no distinct
    // collapse), the shape that survives duplicate-heavy 100 TB inputs.
    Q("set_intersect_all",
      (s, d) => {
        val a = Tables.orders(s, d).filter(col("o_totalprice") > 100000)
          .select("o_orderpriority", "o_orderstatus")
        val b = Tables.orders(s, d)
          .filter(col("o_orderdate") > lit("1998-01-01").cast("timestamp"))
          .select("o_orderpriority", "o_orderstatus")
        a.intersectAll(b).orderBy("o_orderpriority", "o_orderstatus")
      },
      Some("""SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_totalprice > 100000
             |INTERSECT ALL
             |SELECT o_orderpriority, o_orderstatus FROM orders
             |WHERE o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
             |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)),

    Q("set_except_all",
      (s, d) => {
        val a = Tables.orders(s, d).filter(col("o_totalprice") > 100000)
          .select("o_orderpriority", "o_orderstatus")
        val b = Tables.orders(s, d)
          .filter(col("o_orderdate") > lit("1998-01-01").cast("timestamp"))
          .select("o_orderpriority", "o_orderstatus")
        a.exceptAll(b).orderBy("o_orderpriority", "o_orderstatus")
      },
      Some("""SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_totalprice > 100000
             |EXCEPT ALL
             |SELECT o_orderpriority, o_orderstatus FROM orders
             |WHERE o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
             |ORDER BY o_orderpriority, o_orderstatus""".stripMargin))
  )
}
