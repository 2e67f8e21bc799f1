package graft.operators

import graft.{Ops, Q, Tables}
import org.apache.spark.sql.functions._

/** §2.K — LLM-data-pipeline + catalog-heat operators. */
object Llm {
  import Ops._

  val queries: Seq[Q] = Seq(
    // Catalog "heat" analog: daily activity rollup over the audit-log-
    // shaped events table.
    Q("heat_daily",
      (s, d) => Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          countDistinct(col("user_id")).as("active_users"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))
        .orderBy("day"),
      Some(s"""SELECT CAST(ts AS DATE) AS day,
              |COUNT(DISTINCT user_id) AS active_users,
              |COUNT(*) AS n_events,
              |${SQL_DSUM("value")} AS sum_value
              |FROM events GROUP BY 1 ORDER BY day""".stripMargin))
  )
}
