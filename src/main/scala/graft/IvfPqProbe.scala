package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.graftbridge.Bridge

/** Recall decomposition probe for the IVF+PQ family (round-8 verdict
  * Next #1): runs the `ann_ivfpq_adc` pipeline in all four
  * {raw, residual} × {probes} corners and prints recall@10 against
  * exact L2 ground truth, so the PERF.md table can separate the
  * ROUTING gain (more probed cells ⇒ higher ceiling) from the
  * QUANTIZATION gain (residual codes ⇒ more of the ceiling captured).
  * Dev-only measurement main — not part of the declared query surface.
  *
  * Usage: runMain graft.IvfPqProbe <sfDir> [probesCsv]
  */
object IvfPqProbe {
  private val M = 4; private val SUB = 16; private val PQK = 16
  private val CELLS = 16; private val ITERS = 5
  private val RERANK = 30; private val TOPK = 10; private val QID = 0L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val probesList = args.lift(1).getOrElse("2,4").split(",").map(_.toInt).toSeq
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = Tables.embeddings(spark, sfDir)
    val vcol = expr("transform(embedding, e -> cast(e as double))")
    val base = embs.select(col("vec_id"), vcol.as("v")).cache()
    val q: Array[Double] = base.filter(col("vec_id") === QID)
      .select(col("v")).head.getSeq[Double](0).toArray
    val qlit = typedlit(q.toSeq)
    val trueD = aggregate(
      zip_with(col("v"), qlit, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, e) => acc + e)
    val exact: Set[Long] = base.filter(col("vec_id") =!= QID)
      .withColumn("__d", trueD)
      .orderBy(col("__d"), col("vec_id")).limit(TOPK)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    println(s"exact top-$TOPK: ${exact.toSeq.sorted.mkString(",")}")

    val coarse = graft.api.Similarity.kmeansCodebook(
      base, "vec_id", "v", CELLS, ITERS)
    val coarseLit = typedlit(coarse.map(_.toSeq).toSeq)
    val cellRank: Seq[Int] = coarse.zipWithIndex.map { case (c, i) =>
      var s2 = 0.0; var j = 0
      while (j < c.length) { val dx = q(j) - c(j); s2 += dx * dx; j += 1 }
      (s2, i)
    }.sortBy(identity).map(_._2).toSeq
    val assigned = base
      .withColumn("cell", element_at(Bridge.column(
        graft.functions.NearestCells(UnresolvedAttribute("v"), coarse, 1)), 1))
      .withColumn("r", zip_with(col("v"),
        element_at(coarseLit, col("cell") + 1), (x, y) => x - y))
      .cache()
    val cellOf: Map[Long, Int] = assigned
      .filter(col("vec_id").isin(exact.toSeq: _*))
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    def run(residual: Boolean, probes: Int): (Double, Double) = {
      val probed = cellRank.take(probes)
      val ceiling = exact.count(id => probed.contains(cellOf(id))) / TOPK.toDouble
      val srcCol = if (residual) "r" else "v"
      def subCol(m: Int) = expr(s"slice($srcCol, ${m * SUB + 1}, $SUB)")
      val cbs: Array[Array[Array[Double]]] = (0 until M).map { m =>
        graft.api.Similarity.kmeansCodebook(
          assigned.select(col("vec_id"), subCol(m).as("sub")),
          "vec_id", "sub", PQK, ITERS)
      }.toArray
      // LUT: per-cell for residual (query residual differs per probed
      // cell); global for raw
      def lutFor(m: Int, cell: Int): Seq[Double] = cbs(m).toSeq.map { c =>
        var s2 = 0.0; var i = 0
        while (i < SUB) {
          val qc = if (residual) q(m * SUB + i) - coarse(cell)(m * SUB + i)
                   else q(m * SUB + i)
          val dx = qc - c(i); s2 += dx * dx; i += 1
        }
        s2
      }
      var coded = assigned.filter(col("vec_id") =!= QID)
        .filter(col("cell").isin(probed: _*))
      for (m <- 0 until M)
        coded = coded
          .withColumn(s"sub_$m", subCol(m))
          .withColumn(s"code_$m", element_at(Bridge.column(
            graft.functions.NearestCells(
              UnresolvedAttribute(s"sub_$m"), cbs(m), 1)), 1))
      val luts: Array[Seq[Seq[Double]]] = (0 until M).map { m =>
        coarse.indices.map(cell => lutFor(m, cell)).toSeq
      }.toArray
      val adc = (0 until M)
        .map(m => element_at(
          element_at(typedlit(luts(m)), col("cell") + 1),
          col(s"code_$m") + 1))
        .reduce(_ + _)
      val got: Set[Long] = coded.withColumn("__adc", adc)
        .orderBy(col("__adc"), col("vec_id")).limit(RERANK)
        .withColumn("__true", trueD)
        .orderBy(col("__true"), col("vec_id")).limit(TOPK)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      (ceiling, exact.intersect(got).size / TOPK.toDouble)
    }

    println(f"${"variant"}%-10s ${"probes"}%-7s ${"ceiling"}%-8s recall@$TOPK")
    for (p <- probesList; res <- Seq(false, true)) {
      val (ceil, rec) = run(res, p)
      val name = if (res) "residual" else "raw"
      println(f"$name%-10s $p%-7d $ceil%-8.2f $rec%.2f")
    }
    spark.stop()
  }
}
