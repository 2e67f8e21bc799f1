package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-27 additions, asserted on sf0.001. */
class Wave27Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("export_vacuum_orphans: 2 orphan dirs holding exactly the P rows") {
    val r = q("export_vacuum_orphans").collect().head
    assert(r.getLong(0) == 5L) // part_F part_O part_P_a part_P_b part_P2
    assert(r.getLong(1) == 3L) // live after compaction commit
    assert(r.getLong(2) == 2L) // the replaced P halves
    val pRows = Tables.orders(spark, TestSpark.sf0001)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "P")
      .count()
    assert(r.getLong(3) == pRows)
  }

  test("text_html_strip: round trip recovers every document") {
    val rows = q("text_html_strip").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), "tag-strip round trip must be exact")
    // markup always adds chars; every doc gains at least the fixed wrapper
    val wrapper = "<html><p class=\"c\"></p> <div>&amp; footer</div></html>"
    assert(rows.forall(_.getLong(1) >= wrapper.length.toLong))
    // at least the 4 wrapper tags (+1 per space converted)
    assert(rows.forall(_.getLong(2) >= 4L))
  }
}
