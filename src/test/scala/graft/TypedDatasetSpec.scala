package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double)
case class CustRow(c_custkey: Long, c_name: String, c_mktsegment: String)

/** Typed Dataset API coverage: case-class Encoders, typed filter/map,
  * groupByKey + mapGroups, joinWith (pair-typed join).
  */
class TypedDatasetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders = {
    import spark.implicits._
    Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[OrderRow]
  }
  private def custs = {
    import spark.implicits._
    Tables.customer(spark, TestSpark.sf0001)
      .select("c_custkey", "c_name", "c_mktsegment").as[CustRow]
  }

  test("typed filter + map preserve compile-checked fields") {
    import spark.implicits._
    val prices = orders.filter(_.o_orderstatus == "O").map(_.o_totalprice)
    assert(prices.count() > 0)
    val df = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderstatus") === "O")
    assert(prices.count() == df.count())
  }

  test("groupByKey + mapGroups computes per-customer max") {
    import spark.implicits._
    val maxTyped = orders.groupByKey(_.o_custkey)
      .mapGroups((k, rows) => (k, rows.map(_.o_totalprice).max))
      .toDF("cust", "max_price")
    val maxSql = Tables.orders(spark, TestSpark.sf0001)
      .groupBy(col("o_custkey").as("cust"))
      .agg(max(col("o_totalprice")).as("max_price"))
    assert(maxTyped.exceptAll(maxSql).count() == 0)
    assert(maxSql.exceptAll(maxTyped).count() == 0)
  }

  test("joinWith returns typed pairs") {
    val ods = orders
    val cds = custs
    val pairs = ods.joinWith(cds, ods("o_custkey") === cds("c_custkey"), "inner")
    val (ordRow, custRow) = pairs.head()
    assert(ordRow.o_custkey == custRow.c_custkey)
    assert(pairs.count() == 1500)
  }
}
