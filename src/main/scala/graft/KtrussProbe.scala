package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only round-level timing probe for graph_ktruss (r11 verdict
  * item #1): rebuilds the 10-minute co-activity pair graph and times
  * the pair build and each peel round separately so the >5 s official
  * cost can be attributed (wedge join vs checkpoint vs count).
  * Usage: runMain graft.KtrussProbe [sfDir]
  */
object KtrussProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ktruss-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val MaxCellUsers = 12
    val a = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 600000000").as("h"))
      .distinct()
    val ok = a.groupBy("event_type", "h")
      .agg(count(lit(1)).as("k")).filter(col("k") <= MaxCellUsers)
      .drop("k")
    val af = a.join(ok, Seq("event_type", "h"))
    val pairs = af.as("a").join(af.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.h") === col("b.h") &&
          col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .distinct()
    // warm-up at sf0.001 to exclude JIT/codegen from the timings
    time("warmup (sf0.001)") {
      SparkEntry.queries("graph_ktruss")(spark, "/root/testdata/sf0.001").count()
    }
    var es = time("pair build + checkpoint") {
      val e = pairs.localCheckpoint(); e.count(); e
    }
    var before = es.count()
    println(s"[ktruss-probe] initial edges=$before")
    val K = 4
    var stable = false
    var round = 0
    while (!stable && round < 8) {
      round += 1
      val p = cpus.toInt
      val sup = time(s"round $round intersect+checkpoint") {
        val adj = es.unionByName(es.select(col("v").as("u"), col("u").as("v")))
          .groupBy("u").agg(sort_array(collect_set(col("v"))).as("ns"))
        val a1 = broadcast(adj.select(col("u").as("__n1"), col("ns").as("__ns1")))
        val a2 = broadcast(adj.select(col("u").as("__n2"), col("ns").as("__ns2")))
        es.repartition(p)
          .join(a1, col("u") === col("__n1"))
          .join(a2, col("v") === col("__n2"))
          .select(col("u"), col("v"),
            size(array_intersect(col("__ns1"), col("__ns2")))
              .cast("long").as("support"))
          .filter(col("support") >= K - 2)
          .localCheckpoint()
      }
      val after = time(s"round $round count") { sup.count() }
      println(s"[ktruss-probe] round $round: $before -> $after")
      stable = after == before
      before = after
      es = sup.select("u", "v")
    }
    spark.stop()
  }
}
