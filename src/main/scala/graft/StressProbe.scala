package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: drive the dedup + curation stack BEYOND fixture
  * scale on a locally generated corpus (written under java.io.tmpdir —
  * never the read-only driver fixtures) with three engineered hazards
  * a 100 TB corpus exhibits and sf0.1 does not:
  *
  *  1. volume — `xFactor` perturbed copies of the sf0.1 corpus
  *     (default 20× ≈ 100k docs);
  *  2. a duplicate seam — every 10th replica keeps its source text
  *     verbatim (exact dups) and every 5th mutates one token
  *     (near dups), so the LSH chain has real work at volume;
  *  3. source skew — replica docs collapse onto ONE source value, the
  *     mixture/aggregation skew case.
  *
  * Prints stage wall-clocks and the candidate-pair / component counts,
  * so PERF.md's scale-behavior claims are measured, not extrapolated.
  * Usage: `sbt "runMain graft.StressProbe [sfDir] [xFactor]"`.
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val x = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[stress-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val corpusDir = s"${sys.props("java.io.tmpdir")}/graft_stress_v4_${x}x"
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      time(s"generate ${x}x corpus → $corpusDir") {
        generate(spark, d, x).write.mode("overwrite").parquet(corpusDir)
      }
    }
    val docs = spark.read.parquet(corpusDir)
    println(s"[stress-probe] corpus rows: ${docs.count()}")

    // cold-start the chain exactly as a fresh cluster job would
    spark.catalog.clearCache()
    val pairs = time("LSH candidate pairs (cold: shingle+minhash+band)") {
      val p = graft.api.Dedup.lshCandidatePairs(docs, "doc_id", "text")
      val n = p.count(); println(s"[stress-probe]   candidate pairs: $n"); p
    }
    time("Jaccard verify (pair caches shared)") {
      val v = graft.api.Dedup.jaccardVerify(docs, "doc_id", "text")
        .filter(col("is_near_dup"))
      println(s"[stress-probe]   verified near-dup pairs: ${v.count()}")
    }
    time("connected components (terminal: releases chain caches)") {
      val c = graft.api.Dedup.nearDupComponents(docs, "doc_id", "text")
      println(s"[stress-probe]   labeled docs: ${c.count()}")
    }
    time("exact dedup groups") {
      val g = graft.api.Dedup.exactGroups(docs, "doc_id", "text")
        .filter(col("n_docs") > 1)
      println(s"[stress-probe]   exact-dup groups: ${g.count()}")
    }
    time("skewed-source mixture aggregate") {
      graft.api.TextMetrics.quality(docs, "doc_id", "text",
        Seq("the", "a", "of", "and", "to", "in")).count()
    }
    // round-7 sub-document ops at the same volume: the line-dedup and
    // span-coverage shapes multiply rows by lines/grams per doc, so
    // their beyond-fixture wall-clock is the scale evidence their
    // SURVEY claims rest on
    time("line-level boilerplate dedup (3-token lines, >2 docs)") {
      val r = graft.api.Dedup.dropBoilerplateLines(docs, "doc_id", "text")
      println(s"[stress-probe]   docs reassembled: ${r.count()}")
    }
    time("exact-substring span coverage (5-gram, >=2 docs)") {
      val r = graft.api.Dedup.exactSubstringSpans(docs, "doc_id", "text")
        .filter(col("dup_heavy"))
      println(s"[stress-probe]   dup-heavy docs: ${r.count()}")
    }
    time("unicode normalize suite (NFC UDF + regexp passes)") {
      graft.api.TextMetrics.normalize(docs, "text").count()
    }
    pairs.unpersist(blocking = false)
    spark.stop()
  }

  /** Base corpus + (x-1) perturbed replicas with fresh ids: replica r
    * of doc i keeps the text verbatim when r % 10 == 0 (exact dup),
    * swaps the first token when r % 5 == 0 (near dup — every shingle
    * but the leading three survives), and otherwise replaces EVERY
    * THIRD token with a (replica, BASE-DOC)-unique marker — every
    * 3-token shingle contains a mutated position, so the shingle set
    * is disjoint from the base's and from every other doc's.
    *
    * Two generator designs measured before this one, both instructive
    * for synthetic-corpus work over a ~20-word vocabulary:
    * a prefix-token edit left the shingle set ~intact (20-clique per
    * base doc → 1.05M verified pairs), and a per-replica-ONLY marker
    * collapsed shingles to 2-grams of the tiny vocab (same-r replicas
    * of DIFFERENT docs became near-dups → 0.7M pairs). The chain
    * processed both pathological graphs fine (39 s / 41 s) — kept as
    * the measured worst-case evidence — but the doc-keyed marker is
    * what yields a realistic ~20% dup-rate corpus. All replicas land
    * on source 'src_hot' — deliberate skew.
    */
  private def generate(spark: SparkSession, d: String, x: Int): DataFrame = {
    val base = Tables.documents(spark, d)
    val n = base.count()
    val replicas = base.crossJoin(
        spark.range(1, x).toDF("r"))
      .select(
        (col("doc_id") + col("r") * n).as("doc_id"),
        when(col("r") % 10 === 0, col("text"))
          .when(col("r") % 5 === 0,
            concat(lit("swapped"), expr("substring(text, instr(text, ' '))")))
          // marker must be LETTERS-ONLY: the chain's tokenizer strips
          // [^a-z ], so digit-bearing markers all collapse to one token
          // (measured: 'r1d0'/'r2d0' → both 'rd' → 16-cliques again).
          // translate() maps the digits of (r, doc_id) to letters.
          .otherwise(array_join(
            expr("transform(split(text, ' '), (tok, i) -> " +
              "IF(i % 3 = 0, translate(concat('q', r, 'x', doc_id), " +
              "'0123456789', 'abcdefghij'), tok))"), " ")).as("text"),
        col("lang"), lit("src_hot").as("source"), col("n_chars"))
    base.select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(replicas)
  }
}
