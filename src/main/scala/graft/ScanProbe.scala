package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: per-query FileScan census over the whole declared surface.
  * A query whose FINAL plan scans the same fact table many times MAY be
  * re-deriving corpus work its consumers should share (the r13
  * llm_pmi_cooccur finding: 5 tokenize passes where 2 suffice). Prints
  * queries whose plan holds > `threshold` FileScans of one table,
  * worst first. Checkpointed/broadcast model-sized frames don't count
  * (they appear as ExistingRDD, not FileScan).
  *
  * CAVEAT (r13, measured): this is a STATIC count and overstates real
  * I/O — Spark's ReuseExchange dedups identical shuffle subtrees at
  * execution, so branches that differ only above their first Exchange
  * already share the scan+map work. Treat a hit as a lead, then
  * MEASURE: of the 7 top offenders fixed with eager localCheckpoint,
  * only ts_seasonal_esd got faster (2.25 → 1.57 min); six others paid
  * more for the checkpoint job than the reused scans cost and were
  * reverted. The census stays valuable for (a) plan-TREE blowups the
  * analyzer must walk (llm_bpe_tokenize printed 2^13 scans from nested
  * cache() lineage) and (b) duplicated subtrees with NO common
  * exchange boundary.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val threshold = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val p = fn(spark, sfDir).queryExecution.executedPlan.toString
          val perTable = p.linesIterator
            .filter(_.contains("FileScan"))
            .toSeq
            .groupBy { l =>
              // attribute the scan to its source path's last segment
              val i = l.indexOf("Location")
              if (i >= 0) l.substring(i).split("[/\\],]").reverse
                .find(_.nonEmpty).getOrElse("?")
              else "?"
            }
            .map { case (t, ls) => (t, ls.size) }
          perTable.filter(_._2 > threshold)
            .map { case (t, n) => (name, t, n) }
        } catch { case e: Throwable =>
          System.err.println(s"[scan-probe] $name failed: ${e.getMessage}")
          Nil
        }
    }
    results.sortBy(-_._3).foreach { case (q, t, n) =>
      println(f"[scan-probe] $n%2d x $t%-28s $q")
    }
    println(s"[scan-probe] ${results.size} (query, table) pairs over " +
      s"threshold $threshold across ${SparkEntry.queries.size} queries")
    spark.stop()
  }
}
