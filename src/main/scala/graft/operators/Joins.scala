package graft.operators

import graft.{Ops, Q, Tables}
import org.apache.spark.sql.functions._

/** §2.C — joins.
  *
  * Scale notes: dimension tables (region 5, nation 25, supplier sf*1e3)
  * are explicitly `broadcast()` — no shuffle of the fact side for those
  * edges. The customer⋈orders⋈lineitem spine shuffles on its keys
  * (sort-merge at scale, AQE may downgrade to broadcast when small);
  * that is the correct 100 TB plan: one key-partitioned exchange per
  * fact-fact edge, dims shipped to executors.
  */
object Joins {
  import Ops._

  val queries: Seq[Q] = Seq(
    // TPC-H Q5 shape — also the flagship `entry()`.
    Q("join_star_5way",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val li = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d)
        val nat = Tables.nation(s, d)
        val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
        cust.join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(dsumExact(revenueDec(col("l_extendedprice"), col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name, ${SQL_DSUM_EXACT(SQL_REV_DEC)} AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
              |GROUP BY n_name
              |ORDER BY revenue DESC, n_name""".stripMargin))
  )
}
