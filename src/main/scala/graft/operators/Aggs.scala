package graft.operators

import graft.{Ops, Q, Tables}
import org.apache.spark.sql.functions._

/** §2.D — aggregations.
  *
  * Scale notes: all groupBy aggregates here compile to partial
  * HashAggregate (map-side combine) + final HashAggregate after a
  * key-shuffle — linear scans with small shuffled state at any scale.
  * No driver-side state; spill to sort-based agg is automatic.
  */
object Aggs {
  import Ops._

  val queries: Seq[Q] = Seq(
    Q("agg_pricing_summary",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumExact(revenueDec(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
          dsumExact(chargeDec(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("sum_charge"),
          avg4(col("l_quantity")).as("avg_qty"),
          avg4(col("l_extendedprice")).as("avg_price"),
          avg46(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |${SQL_DSUM("l_quantity")} AS sum_qty,
              |${SQL_DSUM("l_extendedprice")} AS sum_base_price,
              |${SQL_DSUM_EXACT(SQL_REV_DEC)} AS sum_disc_price,
              |${SQL_DSUM_EXACT(SQL_CHARGE_DEC)} AS sum_charge,
              |${SQL_AVG4("l_quantity")} AS avg_qty,
              |${SQL_AVG4("l_extendedprice")} AS avg_price,
              |${SQL_AVG46("l_discount")} AS avg_disc,
              |COUNT(*) AS count_order
              |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin))
  )
}
