package graft

import org.apache.spark.sql.functions._

/** Beyond-fixture stress probe for the api.Graph primitives (round-8):
  * the declared co-activity graph is stop-cell-capped to a few
  * thousand edges, so this drives connectedComponents / kcore /
  * hopDistances on a DETERMINISTIC synthetic graph (xxhash64 edge
  * targets — no RNG) orders of magnitude larger, and prints wall
  * times and structural outputs. The interesting numbers are the
  * CONVERGENCE dynamics: min-label propagation and BFS relaxation
  * round counts track the random graph's ~log(n) diameter, so wall
  * scales with diameter × per-round shuffle cost, not edge count
  * alone — exactly the behavior a 1000-executor deployment sees.
  *
  * Usage: runMain graft.GraphProbe [nNodes]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[graph-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ~2 pseudo-random out-edges per node (self-loops dropped), both
    // directions: one giant component with ~log(n) diameter
    val ids = spark.range(n.toLong)
    val e0 = ids.select(col("id").as("u"),
        pmod(xxhash64(col("id"), lit(1)), lit(n.toLong)).as("v"))
      .unionByName(ids.select(col("id").as("u"),
        pmod(xxhash64(col("id"), lit(2)), lit(n.toLong)).as("v")))
      .filter(col("u") =!= col("v"))
    val edges = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().cache()
    val m = edges.count()
    println(s"[graph-probe] nodes=$n directed-edges=$m")

    val comp = time(s"connectedComponents ($m edges)") {
      val c = graft.api.Graph.connectedComponents(edges, "u", "v")
      c.select(countDistinct("component"), count(lit(1))).head()
    }
    println(s"[graph-probe]   components=${comp.getLong(0)} nodes-labeled=${comp.getLong(1)}")

    val core = time("kcore k=4") {
      graft.api.Graph.kcore(edges, "u", "v", 4, maxRounds = 64).count()
    }
    println(s"[graph-probe]   4-core nodes=$core")

    val hops = time("hopDistances from node 0") {
      graft.api.Graph.hopDistances(edges, "u", "v", 0L)
        .agg(count(lit(1)), max("d")).head()
    }
    println(s"[graph-probe]   reached=${hops.getLong(0)} eccentricity=${hops.getLong(1)}")
    spark.stop()
  }
}
