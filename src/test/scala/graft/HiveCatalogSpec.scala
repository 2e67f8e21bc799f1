package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's literal domain surface: a Hive metastore (embedded
  * Derby) round trip — create, list, describe, analyze — plus
  * source/sink breadth (csv/json/partitioned parquet).
  */
class HiveCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hive metastore roundtrip: create/list/describe/analyze") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat")
    spark.sql("DROP TABLE IF EXISTS graft_cat.nation_copy")
    Tables.nation(spark, TestSpark.sf0001)
      .write.mode("overwrite").saveAsTable("graft_cat.nation_copy")

    val tables = spark.catalog.listTables("graft_cat").collect().map(_.name)
    assert(tables.contains("nation_copy"))

    val cols = spark.catalog.listColumns("graft_cat", "nation_copy")
      .collect().map(c => (c.name, c.dataType)).toMap
    assert(cols("n_nationkey") == "int" && cols("n_name") == "string")

    spark.sql("ANALYZE TABLE graft_cat.nation_copy COMPUTE STATISTICS")
    val described = spark.sql("DESCRIBE EXTENDED graft_cat.nation_copy")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described("Statistics").contains("25 rows"))

    assert(spark.table("graft_cat.nation_copy").count() == 25)
  }

  test("csv and json roundtrip preserves data") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_io").toString
    val src = Tables.region(spark, TestSpark.sf0001)
    src.write.option("header", "true").csv(s"$tmp/csv")
    val csvBack = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$tmp/csv")
    assert(csvBack.count() == 5 &&
      csvBack.schema("r_regionkey").dataType.typeName == "integer")

    src.write.json(s"$tmp/json")
    val jsonBack = spark.read.json(s"$tmp/json")
    assert(jsonBack.count() == 5)
    assert(jsonBack.select("r_name").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.head == "AFRICA")
  }

  test("orc and text roundtrip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = Tables.nation(spark, TestSpark.sf0001)
    src.write.orc(s"$tmp/orc")
    val orcBack = spark.read.orc(s"$tmp/orc")
    assert(orcBack.count() == 25)
    assert(orcBack.schema("n_nationkey").dataType.typeName == "integer")

    src.select(col("n_name")).write.text(s"$tmp/txt")
    assert(spark.read.text(s"$tmp/txt").count() == 25)
  }

  test("dynamic partition pruning kicks in for a filtered dim join") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.orders(spark, TestSpark.sf0001)
      .write.partitionBy("o_orderstatus").parquet(s"$tmp/fact")
    val fact = spark.read.parquet(s"$tmp/fact")
    // dim must be file-backed with a surviving filter — a literal local
    // relation gets constant-folded and the PartitionPruning rule then
    // has no predicate to derive the DPP subquery from
    Seq(("O", "open"), ("F", "filled"), ("P", "pending"))
      .toDF("status", "label").write.parquet(s"$tmp/dim")
    val dim = spark.read.parquet(s"$tmp/dim").filter(col("label") === "open")
    val joined = fact.join(dim, col("o_orderstatus") === col("status"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
    assert(joined.count() ==
      Tables.orders(spark, TestSpark.sf0001)
        .filter(col("o_orderstatus") === "O").count())
  }

  test("partitioned parquet write prunes partitions on read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.customer(spark, TestSpark.sf0001)
      .write.partitionBy("c_mktsegment").parquet(s"$tmp/cust")
    val back = spark.read.parquet(s"$tmp/cust")
      .filter(col("c_mktsegment") === "BUILDING")
    val scanned = back.queryExecution.executedPlan.toString
    assert(back.count() ==
      Tables.customer(spark, TestSpark.sf0001)
        .filter(col("c_mktsegment") === "BUILDING").count())
    // partition filter must appear as a partition-pruning predicate,
    // not a data filter
    assert(scanned.contains("PartitionFilters") &&
      scanned.contains("c_mktsegment"), scanned)
  }
}
