package graft



/** Diagnostic main: stage-by-stage wall-clock of the dedup chain at a
  * given SF (cold caches), so PERF.md's chain accounting is measured.
  * Usage: `sbt "runMain graft.DedupProbe /root/testdata/sf0.1"`
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dedup-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, d)
    // warm-up: JIT + codegen on the small SF
    graft.api.Dedup.jaccardVerify(Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text").count()
    spark.catalog.clearCache()

    val shingles = time("shingle explode + persist") {
      val s = graft.api.Dedup.shingleRows(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    time("minhash signatures (16 seeds over cached shingles)") {
      graft.api.Dedup.minhashSignatures(docs, "doc_id", "text").count()
    }
    time("banded signatures (signatures + band md5 + posexplode)") {
      graft.api.Dedup.lshBanded(docs, "doc_id", "text").count()
    }
    time("LSH candidate pairs (banding + bucket group + expand)") {
      graft.api.Dedup.lshCandidatePairs(docs, "doc_id", "text").count()
    }
    time("LSH candidate pairs AGAIN (pairs persist hit)") {
      graft.api.Dedup.lshCandidatePairs(docs, "doc_id", "text").count()
    }
    time("collect_set branch + pair joins (pairs cached)") {
      graft.api.Dedup.jaccardVerify(docs, "doc_id", "text").count()
    }
    time("fixpoint loop (everything cached)") {
      graft.api.Dedup.nearDupComponents(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
