package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The declared query set is the concatenation of the §2 category
  * modules; each module row is a [[Q]] (fn + optional DuckDB oracle).
  */
object SparkEntry {
  import graft.operators._

  def all: Seq[Q] =
    Scans.queries ++ Filters.queries ++ Joins.queries ++ Aggs.queries ++
      Windows.queries ++ SortsSets.queries ++ ScalarFns.queries ++
      Subqueries.queries ++ TypedOps.queries ++ Udfs.queries ++ Llm.queries ++
      TextAnalysis.queries ++ DataOps.queries ++ Pipeline.queries ++ Bpe.queries ++
      Graphs.queries ++ Stats2.queries ++ Evals.queries ++
      graft.streaming.Streams.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("join_star_5way")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
