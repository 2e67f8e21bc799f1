package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** Native ≡ HOF pins for the r11 per-row scan expressions
  * (CodepointBinCounts, FrameByteStats): each native expression must
  * reproduce the exact rows of the interpreted higher-order-function
  * form it replaced — on the real sf0.001 documents AND on a
  * hand-built frame with multi-byte codepoints and boundary lengths
  * the fixture's ≥60-char ASCII docs never exercise.
  */
class NativeFrameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = Tables.documents(spark, TestSpark.sf0001)
    .select("doc_id", "text")

  private def edge = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ""),                               // empty: native emits []
      (2L, "a"),                              // single char
      (3L, "abc"),                            // shorter than one frame
      (4L, "x" * 64),                         // exactly one frame
      (5L, "y" * 65),                         // one full + 1-char frame
      (6L, "héllo wörld ±§ з 漢字 𐍈 end"),   // 2/3/4-byte codepoints
      (7L, "z" * 200 + "é" * 30)              // multi-frame mixed
    ).toDF("doc_id", "text")
  }

  test("CodepointBinCounts == per-char HOF histogram (fixture + unicode edges)") {
    for (df <- Seq(docs, edge)) {
      val native = df.select(col("doc_id"), explode(Bridge.column(
          graft.functions.CodepointBinCounts(
            Bridge.expression(col("text")), 16))).as("p"))
        .select(col("doc_id"), col("p.bin").as("bin"), col("p.cnt").as("cnt"))
      val hof = df.filter(length(col("text")) > 0)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, cast(length(text) as int)),
            |  i -> cast(ascii(substring(text, i, 1)) div 16 as bigint))"""
            .stripMargin)).as("bin"))
        .groupBy("doc_id", "bin").agg(count(lit(1)).as("cnt"))
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
        "native codepoint histogram diverges from the HOF form")
    }
  }

  test("FrameByteStats == per-char HOF frame sums/squares (fixture + unicode edges)") {
    for (df <- Seq(docs, edge)) {
      val native = df.select(col("doc_id"),
          posexplode(Bridge.column(graft.functions.FrameByteStats(
            Bridge.expression(col("text")), 64))))
        .select(col("doc_id"), col("pos"),
          col("col.fsum").as("fsum"), col("col.fsq").as("fsq"),
          col("col.flen").as("flen"))
      val hof = df
        .withColumn("n", length(col("text")).cast("long"))
        .withColumn("nf", expr("(n + 63) div 64"))
        .filter(col("nf") > 0)
        .select(col("doc_id"), col("n"), posexplode(expr(
          """transform(sequence(0L, nf - 1), f -> struct(
            |  aggregate(transform(sequence(1L, least(cast(64 as bigint),
            |      n - f * 64)),
            |    i -> cast(ascii(substring(text, cast(f * 64 + i as int), 1))
            |         as bigint)),
            |    cast(0 as bigint), (acc, x) -> acc + x) as fsum,
            |  aggregate(transform(sequence(1L, least(cast(64 as bigint),
            |      n - f * 64)),
            |    i -> cast(ascii(substring(text, cast(f * 64 + i as int), 1))
            |         as bigint)),
            |    cast(0 as bigint), (acc, x) -> acc + x * x) as fsq,
            |  least(cast(64 as bigint), n - f * 64) as flen))"""
            .stripMargin)))
        .select(col("doc_id"), col("pos"),
          col("col.fsum").as("fsum"), col("col.fsq").as("fsq"),
          col("col.flen").as("flen"))
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
        "native frame stats diverge from the HOF form")
    }
  }

  test("empty text: native forms are empty arrays, no sequence auto-reverse error") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val fr = df.select(size(Bridge.column(graft.functions.FrameByteStats(
      Bridge.expression(col("text")), 64))).as("nf")).head()
    assert(fr.getInt(0) == 0)
    val hb = df.select(size(Bridge.column(graft.functions.CodepointBinCounts(
      Bridge.expression(col("text")), 16))).as("nb")).head()
    assert(hb.getInt(0) == 0)
    // the full queries must not error on an empty-text row either
    assert(SparkEntry.queries("mm_shot_detect")(spark, TestSpark.sf0001)
      .limit(1).count() == 1)
  }
}
