package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stats-driven planning: the collector's own output (`ANALYZE TABLE`
  * statistics in the metastore) feeds back into Catalyst's planner —
  * the reason a metadata collector exists in a warehouse. For a
  * hive-serde table with NO stats, Spark must assume
  * `defaultSizeInBytes` (Long.MaxValue ⇒ never broadcast); once
  * ANALYZE records the real size/rowCount, the same join plans as a
  * BroadcastHashJoin and CBO sees an exact rowCount.
  */
class CboSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plannedJoin(): String = {
    // hive-serde table sizes resolve at planning; AQE not yet run
    spark.table("graft_cbo.orders_f")
      .join(spark.table("graft_cbo.nation_d"),
        col("o_custkey") % 25 === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .queryExecution.sparkPlan.toString
  }

  test("ANALYZE TABLE flips an un-broadcastable hive join to BroadcastHashJoin") {
    // Keep the hive-serde relation un-converted: a converted parquet
    // relation lists its files at plan time and knows its size without
    // the metastore — which is precisely NOT the scenario a stats
    // collector serves. Un-converted, the planner's only size source is
    // catalog stats.
    spark.conf.set("spark.sql.hive.convertMetastoreParquet", "false")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cbo")
    spark.sql("DROP TABLE IF EXISTS graft_cbo.nation_d")
    spark.sql("DROP TABLE IF EXISTS graft_cbo.orders_f")
    // EXTERNAL hive-serde tables whose data files land AFTER creation:
    // Hive's stats autogather sees an empty location at CREATE (records
    // totalSize=0 ⇒ Spark surfaces no stats), so until ANALYZE runs the
    // metastore genuinely holds no size — the exact staleness scenario
    // a stats collector exists to fix. (A CTAS, or a create over
    // pre-existing files, auto-records a real totalSize.)
    val base = java.nio.file.Files.createTempDirectory("graft_cbo")
    def external(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val loc = base.resolve(name)
      java.nio.file.Files.createDirectories(loc)
      spark.sql(s"CREATE EXTERNAL TABLE graft_cbo.$name (${df.schema.toDDL}) " +
        s"STORED AS PARQUET LOCATION '$loc'")
      val staging = base.resolve(s"${name}_staging")
      df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      java.nio.file.Files.list(staging).filter(_.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.copy(p, loc.resolve(p.getFileName)))
    }
    external("nation_d", Tables.nation(spark, TestSpark.sf0001))
    external("orders_f", Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice"))

    try {
      val before = plannedJoin()
      assert(!before.contains("BroadcastHashJoin"),
        s"without stats the 25-row dim must NOT broadcast:\n$before")
      assert(before.contains("SortMergeJoin") || before.contains("ShuffledHashJoin"),
        s"without stats the join must shuffle both sides:\n$before")

      spark.sql("ANALYZE TABLE graft_cbo.nation_d COMPUTE STATISTICS")
      val after = plannedJoin()
      assert(after.contains("BroadcastHashJoin"),
        s"with ANALYZE'd size the dim must broadcast:\n$after")
    } finally spark.conf.unset("spark.sql.hive.convertMetastoreParquet")
  }

  test("CBO exposes ANALYZE'd rowCount to the optimizer") {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.hive.convertMetastoreParquet", "false")
    try {
      val rc = spark.table("graft_cbo.nation_d")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(rc.contains(BigInt(25)),
        s"CBO must see the exact ANALYZE'd rowCount, got $rc")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.unset("spark.sql.hive.convertMetastoreParquet")
    }
  }
}
