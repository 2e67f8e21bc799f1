package graft

import org.apache.spark.sql.functions._

/** BPE trainer at synthetic vocab scale (round-8): the fixture corpus
  * holds only ~35 distinct words, so this probe drives the merge-round
  * loop on a DETERMINISTIC synthetic histogram of `nWords` distinct
  * words (xxhash64-derived letters, zipf-ish frequencies) to measure
  * what actually scales: the per-round pair-count aggregate and
  * map-only merge apply are linear in DISTINCT VOCABULARY, and the
  * corpus size appears nowhere after the (not probed here) initial
  * histogram groupBy. That is the whole 100-TB argument for the
  * histogram-form trainer — a 10× corpus with the same vocabulary
  * costs the same per merge round.
  *
  * Usage: runMain graft.BpeProbe [nWords] [nMerges]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toInt).getOrElse(100000)
    val nMerges = args.lift(1).map(_.toInt).getOrElse(12)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // word i: length 4 + (h mod 9) letters, each letter a hash of
    // (i, position); freq zipf-ish n/(i+1)+1 — no RNG anywhere
    val words = spark.range(nWords.toLong)
      .select(col("id"),
        expr(s"""array_join(transform(sequence(1, 4 + cast(pmod(xxhash64(id), 9) as int)),
                |  p -> char(97 + cast(pmod(xxhash64(id, p), 26) as int))), '')"""
          .stripMargin).as("word"),
        (lit(nWords.toLong) / (col("id") + 1) + 1).cast("long").as("freq"))
      .groupBy("word").agg(max("freq").as("freq")) // hash collisions: keep one
      .withColumn("toks", concat(
        concat_ws(" ", expr("filter(split(word, ''), x -> x <> '')")),
        lit(" </w>")))
    val distinct = words.count()
    println(s"[bpe-probe] distinct words: $distinct (requested $nWords), merges: $nMerges")

    val t0 = System.nanoTime()
    val (merges, _) = graft.operators.Bpe.trainOnWords(words)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-probe] trained ${merges.size} merges in $wall%.1f s " +
      f"(${wall / merges.size}%.2f s/round)")
    merges.take(5).foreach(m =>
      println(s"[bpe-probe]   r${m.rank}: '${m.lhs}'+'${m.rhs}' n=${m.pair_n} " +
        s"vocab=${m.vocab_size} mass=${m.corpus_tokens}"))
    spark.stop()
  }
}
