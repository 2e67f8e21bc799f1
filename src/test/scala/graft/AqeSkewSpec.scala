package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's runtime skew-join split — the mechanism that saves a 100 TB
  * join when one key holds a disproportionate share of the rows
  * (join_skew_salted is the manual alternative; this proves the
  * automatic path works and is correctly configured in GraftSession).
  *
  * Thresholds are scaled down to fixture size: a partition is "skewed"
  * when it exceeds 5× the median AND 64 KB, and the advisory target is
  * 16 KB, so the hot key's partition splits into multiple tasks.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on ONE hot key + 2k spread over 2k keys, joined to a
      // uniform dim: the hot key's shuffle partition dwarfs the median.
      val fact = spark.range(200000).select(lit(7L).as("k"), col("id").as("payload"))
        .union(spark.range(2000).select((col("id") % 2000).as("k"), col("id")))
      val dim = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("attr"))
      val joined = fact.join(dim.hint("MERGE"), "k")
      // collect() executes THIS dataset's QueryExecution (count() would
      // plan a different one whose adaptive plan we can't inspect)
      val n = joined.collect().length
      assert(n == 202000, s"join result wrong: $n")
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.get
      val finalPlan = adaptive.executedPlan.toString
      assert(finalPlan.contains("skew="),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
