package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** graft.functions.WinnowFingerprints: the native one-pass winnow must
  * equal the HOF reference form (base-131 Horner per gram, least-of-4
  * per window, distinct) and honor the winnowing guarantee.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fps(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"),
      Bridge.column(graft.functions.WinnowFingerprints(
        Bridge.expression(col("cleaned")))).as("fps"))

  test("native pass equals the HOF reference on the fixture corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z]", "").as("cleaned"))
      .filter(length(col("cleaned")) >= 11)
    val horner = (0 until 8).foldLeft("CAST(0 AS BIGINT)") {
      (acc, j) => s"($acc * 131 + element_at(cs, i + $j))"
    }
    val ref = docs
      .withColumn("cs", expr(
        "transform(sequence(1, length(cleaned)), k -> ascii(substring(cleaned, k, 1)))"))
      .withColumn("hs", expr(s"transform(sequence(1, size(cs) - 7), i -> $horner)"))
      .select(col("doc_id"), expr(
        """array_sort(array_distinct(transform(sequence(1, size(hs) - 3),
          |  w -> least(element_at(hs, w), element_at(hs, w + 1),
          |             element_at(hs, w + 2), element_at(hs, w + 3)))))"""
          .stripMargin).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = fps(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.size == ref.size)
    ref.foreach { case (id, f) =>
      assert(got(id) == f, s"doc_id=$id fingerprint sets diverge")
    }
  }

  test("guarantee: a shared substring of >= 11 chars shares a fingerprint") {
    // two docs sharing an 11-char run (one full gram window) must
    // select at least one common fingerprint — the SWA 2003 property
    val shared = "quickbrownf"
    val docs = spark.createDataFrame(Seq(
      (1L, s"aaaaaaaaaaaaaaaa${shared}zzzzzzzzzzzz"),
      (2L, s"mmmmmmmmmm${shared}qqqqqqqqqqqqqqq"))).toDF("doc_id", "cleaned")
    val out = fps(docs).collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(out(1L).intersect(out(2L)).nonEmpty,
      "docs sharing an 11-char substring must share a selected fingerprint")
  }

  test("short and null inputs: empty array below one window, null passthrough") {
    val docs = spark.createDataFrame(Seq(
      (1L, Some("abcdefghij")),   // 10 chars: 3 grams, no full window
      (2L, Some("abcdefghijk")),  // 11 chars: exactly one window
      (3L, None: Option[String]))).toDF("doc_id", "cleaned")
    val rows = fps(docs).collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(rows(1L).isEmpty)
    assert(rows(2L).size == 1)
    assert(rows(3L) == null)
  }
}
