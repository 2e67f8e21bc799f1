package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.B — projections / filters / predicates.
  *
  * Scale notes: all predicates are Catalyst-native expressions, so they
  * push down to the parquet scan (row-group skipping via min/max stats)
  * and stay inside whole-stage codegen.
  */
object Filters {

  val queries: Seq[Q] = Seq(
    Q("filter_predicates",
      (s, d) => Tables.customer(s, d)
        .filter((col("c_acctbal") > 1000.0 && col("c_mktsegment") === "BUILDING")
          || !(col("c_nationkey") < 10))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"), col("c_nationkey"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey
             |FROM customer
             |WHERE (c_acctbal > 1000.0 AND c_mktsegment = 'BUILDING')
             |   OR NOT (c_nationkey < 10)
             |ORDER BY c_custkey""".stripMargin)),

    Q("filter_like_regexp",
      (s, d) => Tables.part(s, d)
        .filter(col("p_name").like("%widget%") ||
          col("p_type").rlike("^(ECON|PROMO)") ||
          col("p_brand").startsWith("Brand#1"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand, p_type
             |FROM part
             |WHERE p_name LIKE '%widget%'
             |   OR regexp_matches(p_type, '^(ECON|PROMO)')
             |   OR p_brand LIKE 'Brand#1%'
             |ORDER BY p_partkey""".stripMargin)),

    Q("filter_in_between",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_orderdate").between(
            lit("1997-01-01").cast("timestamp"), lit("1998-06-30").cast("timestamp")))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate").cast("date").as("order_day"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE) AS order_day
             |FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |  AND o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1998-06-30 00:00:00'
             |ORDER BY o_orderkey""".stripMargin)),

    Q("null_semantics",
      (s, d) => Tables.customer(s, d)
        // nullif: BUILDING segment → null; then exercise coalesce,
        // null-safe equality, and IS NULL counting.
        .withColumn("seg_or_null",
          when(col("c_mktsegment") === "BUILDING", lit(null: String))
            .otherwise(col("c_mktsegment")))
        .select(col("c_custkey"),
          col("seg_or_null").isNull.as("is_building"),
          coalesce(col("seg_or_null"), lit("UNKNOWN")).as("seg_filled"),
          (col("seg_or_null") <=> lit(null: String)).as("nullsafe_eq_null"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_building,
             |COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS seg_filled,
             |NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL AS nullsafe_eq_null
             |FROM customer ORDER BY c_custkey""".stripMargin))
  )
}
