package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-metastore collection API — the metadata-collector domain
  * (DBS / TBLS / COLUMNS_V2 / TABLE_PARAMS analogs) expressed over
  * Spark's catalog interface, so it works against any metastore the
  * session is wired to (embedded Derby in tests, a production Hive
  * metastore on a cluster).
  *
  * Catalog metadata is inherently driver-side and small (thousands of
  * tables, not billions of rows) — materializing it into DataFrames is
  * the correct shape; the heavy side (access logs) stays distributed
  * and joins against these small broadcast dims.
  *
  * Per-table metastore calls (`listColumns`, `getTableMetadata`,
  * `listPartitionNames`) are issued CONCURRENTLY over a bounded pool of
  * [[Catalog.rpcParallelism]] workers. Caveat on the payoff: with the
  * in-memory/Derby catalog used in tests the 8-way pipelining is fully
  * parallel, but Spark's `HiveExternalCatalog` serializes every client
  * call on one synchronized Hive client — against a real Hive metastore
  * the workers queue behind that lock and the speedup collapses unless
  * the deployment raises the client-pool side (e.g.
  * `spark.sql.hive.metastore.jars`-level client pooling or one session
  * per worker). The bounded pool is still the right API shape: it caps
  * the stampede either way, and catalogs without the single-client
  * bottleneck (in-memory, REST/Unity-style, Glue) get the full overlap.
  * Results are re-assembled in deterministic table order (the pool
  * changes completion order, never output order).
  */
object Catalog {

  /** Bounded concurrency for per-table metastore RPCs. */
  val rpcParallelism = 8

  /** Map `f` over `xs` with [[rpcParallelism]]-way concurrency,
    * preserving input order.
    */
  private def parMap[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    import scala.collection.parallel.CollectionConverters._
    val pool = new java.util.concurrent.ForkJoinPool(rpcParallelism)
    val par = xs.par
    par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(pool)
    try par.map(f).seq
    finally pool.shutdown()
  }

  /** DBS analog: one row per database. */
  def databases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listDatabases().collect().toSeq
      .map(db => (db.name, db.catalog, db.locationUri))
      .toDF("db_name", "catalog", "location_uri")
  }

  /** TBLS analog: one row per table in `db`. */
  def tables(spark: SparkSession, db: String): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables(db).collect().toSeq
      .map(t => (t.database, t.name, t.tableType, t.isTemporary))
      .toDF("db_name", "table_name", "table_type", "is_temporary")
  }

  /** COLUMNS_V2 analog: one row per column of every table in `db`. */
  def columns(spark: SparkSession, db: String): DataFrame = {
    import spark.implicits._
    val tables = spark.catalog.listTables(db).collect().toSeq
      .filter(!_.isTemporary)
    parMap(tables) { t =>
      spark.catalog.listColumns(db, t.name).collect().zipWithIndex.map {
        case (c, i) =>
          (db, t.name, c.name, c.dataType, i.toLong, c.isPartition, c.isBucket)
      }.toSeq
    }.flatten
      .toDF("db_name", "table_name", "column_name", "type_name", "ordinal",
        "is_partition", "is_bucket")
  }

  /** TABLE_PARAMS / stats analog: per-table size in bytes and row count
    * (populated by `ANALYZE TABLE ... COMPUTE STATISTICS`).
    */
  def tableStats(spark: SparkSession, db: String): DataFrame = {
    import spark.implicits._
    val tables = spark.catalog.listTables(db).collect().toSeq
      .filter(!_.isTemporary)
    parMap(tables) { t =>
        val meta = spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t.name, Some(db)))
        val stats = meta.stats
        (db, t.name,
          stats.map(_.sizeInBytes.toLong).getOrElse(-1L),
          stats.flatMap(_.rowCount).map(_.toLong).getOrElse(-1L),
          meta.provider.getOrElse(""),
          meta.createTime)
      }
      .toDF("db_name", "table_name", "size_bytes", "row_count", "provider",
        "create_time_ms")
  }

  /** PARTITIONS analog: one row per partition of a partitioned table
    * (spec string, location, creation time).
    */
  def partitions(spark: SparkSession, db: String, table: String): DataFrame = {
    import spark.implicits._
    spark.sessionState.catalog
      .listPartitions(org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
      .map { p =>
        (db, table,
          p.spec.map { case (k, v) => s"$k=$v" }.mkString("/"),
          p.storage.locationUri.map(_.toString).getOrElse(""),
          p.createTime)
      }
      .toDF("db_name", "table_name", "partition_name", "location", "create_time_ms")
  }

  /** TAB_COL_STATS analog: per-column statistics recorded by
    * `ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS ...` — NDV,
    * null count, min/max (as strings — type-heterogeneous), avg/max
    * byte length. Tables without column stats contribute no rows.
    */
  def columnStats(spark: SparkSession, db: String): DataFrame = {
    import spark.implicits._
    val tables = spark.catalog.listTables(db).collect().toSeq
      .filter(!_.isTemporary)
    parMap(tables) { t =>
      val meta = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t.name, Some(db)))
      meta.stats.map(_.colStats).getOrElse(Map.empty).toSeq.sortBy(_._1).map {
        case (colName, cs) =>
          (db, t.name, colName,
            cs.distinctCount.map(_.toLong).getOrElse(-1L),
            cs.nullCount.map(_.toLong).getOrElse(-1L),
            cs.min.getOrElse(""), cs.max.getOrElse(""),
            cs.avgLen.map(_.toLong).getOrElse(-1L),
            cs.maxLen.map(_.toLong).getOrElse(-1L))
      }
    }.flatten
      .toDF("db_name", "table_name", "column_name", "ndv", "null_count",
        "min_value", "max_value", "avg_len", "max_len")
  }

  /** Partition growth report: partitions created per calendar day for
    * one table (the collector's "is this table still growing" signal).
    * Derived from the PARTITIONS analog, so it is metastore-only — no
    * data files are touched.
    */
  def partitionGrowth(spark: SparkSession, db: String, table: String): DataFrame =
    partitions(spark, db, table)
      .groupBy(col("table_name"),
        to_date(timestamp_millis(col("create_time_ms"))).as("day"))
      .agg(count(lit(1)).as("n_new_partitions"))

  /** Partition-count report per table (growth/attention lists). */
  def partitionCounts(spark: SparkSession, db: String): DataFrame = {
    import spark.implicits._
    val tables = spark.catalog.listTables(db).collect().toSeq
      .filter(!_.isTemporary)
    parMap(tables) { t =>
        val n =
          try spark.sessionState.catalog
            .listPartitionNames(org.apache.spark.sql.catalyst.TableIdentifier(t.name, Some(db)))
            .size.toLong
          catch { case _: Exception => 0L } // unpartitioned tables
        (db, t.name, n)
      }
      .toDF("db_name", "table_name", "n_partitions")
  }

  /** Storage-format breakdown: table count + total bytes per provider. */
  def storageBreakdown(spark: SparkSession, db: String): DataFrame =
    tableStats(spark, db)
      .groupBy("provider")
      .agg(count(lit(1)).as("n_tables"),
        sum(when(col("size_bytes") >= 0, col("size_bytes")).otherwise(0L))
          .as("total_bytes"))

  /** Access-heat rollup from an audit-log DataFrame: daily access count
    * and distinct users per accessed table. The log side is arbitrarily
    * large — this is a plain distributed aggregate.
    */
  def accessHeat(auditLog: DataFrame, tableCol: String, userCol: String,
      tsCol: String): DataFrame =
    auditLog.groupBy(col(tableCol).as("table_name"),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_accesses"),
        countDistinct(col(userCol)).as("n_users"))

  /** Tables never touched by the audit log (dead-table detection) —
    * the left-anti heat join of the collector's cleanup reports.
    */
  def deadTables(spark: SparkSession, db: String, auditLog: DataFrame,
      tableCol: String): DataFrame =
    tables(spark, db).filter(!col("is_temporary"))
      .join(auditLog.select(col(tableCol).as("table_name")).distinct(),
        Seq("table_name"), "left_anti")
}
