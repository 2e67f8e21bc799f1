package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate the k-truss wedge-join cost at sf0.1. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val a = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 600000000").as("h")).distinct()
    val ok = a.groupBy("event_type", "h")
      .agg(count(lit(1)).as("k")).filter(col("k") <= 12).drop("k")
    val af = a.join(ok, Seq("event_type", "h"))
    val es = af.as("a").join(af.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.h") === col("b.h") && col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .distinct().localCheckpoint()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p] $name%-16s ${(System.nanoTime()-t0)/1e9}%6.2f s ($n)")
    }
    t("edges")(es.count())
    for (i <- 1 to 2) {
      t(s"wedges_$i") {
        es.repartition(32, col("v")).as("e1")
          .join(es.repartition(32, col("u")).as("e2"),
            col("e1.v") === col("e2.u")).count()
      }
      t(s"tri_plain_$i") {
        es.as("e1").join(es.as("e2"), col("e1.v") === col("e2.u"))
          .join(es.as("e3"),
            col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
          .count()
      }
      t(s"tri_rep_$i") {
        es.repartition(32, col("v")).as("e1")
          .join(es.repartition(32, col("u")).as("e2"),
            col("e1.v") === col("e2.u"))
          .join(es.as("e3"),
            col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
          .count()
      }
      t(s"tri_bc_$i") {
        es.repartition(32, col("v")).as("e1")
          .join(broadcast(es).as("e2"), col("e1.v") === col("e2.u"))
          .join(broadcast(es).as("e3"),
            col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
          .count()
      }
    }
    spark.stop()
  }
}
