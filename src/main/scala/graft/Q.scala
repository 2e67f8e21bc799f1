package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator from SURVEY.md §2: a Spark-first implementation
  * plus (where semantically possible) a DuckDB-dialect oracle SQL string
  * over the same parquet tables. `oracle = None` is a deliberate omission
  * (streaming / sketch / engine-specific hash semantics).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
