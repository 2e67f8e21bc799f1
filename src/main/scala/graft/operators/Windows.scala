package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.E — window functions.
  *
  * Scale notes: windows partitioned by a key (custkey / user_id) shuffle
  * once on that key then sort within partitions — no global sort, no
  * driver state. Skewed partitions (one giant customer) would be the
  * 100 TB risk; keys here are uniform by construction.
  */
object Windows {

  val queries: Seq[Q] = Seq(
    Q("win_ranking",
      (s, d) => {
        // rn/ntile need a total order (unique tiebreak); rank/dense_rank
        // are tie-stable so they rank by totalprice alone.
        val wTie = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wVal = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(wTie).cast("long").as("rn"),
            rank().over(wVal).cast("long").as("rnk"),
            dense_rank().over(wVal).cast("long").as("drnk"),
            ntile(4).over(wTie).cast("long").as("quartile"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |ROW_NUMBER() OVER wt AS rn,
             |RANK() OVER wv AS rnk,
             |DENSE_RANK() OVER wv AS drnk,
             |NTILE(4) OVER wt AS quartile
             |FROM orders
             |WINDOW wt AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
             |       wv AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
             |ORDER BY o_custkey, rn""".stripMargin))
  )
}
