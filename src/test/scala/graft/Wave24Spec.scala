package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-24 additions, asserted on sf0.001. */
class Wave24Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("export_txn_time_travel: versions see same data through different files") {
    val rows = q("export_txn_time_travel").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val (v0, v1) = (rows(0), rows(1))
    assert(v0.getLong(1) == 4L && v1.getLong(1) == 3L) // compaction 4 -> 3
    assert(v0.getLong(2) == v1.getLong(2))             // same rows
    assert(v0.getDouble(3) == v1.getDouble(3))         // same money
    assert(v0.getLong(2) == Tables.orders(spark, TestSpark.sf0001).count())
  }

  test("dq_partition_checksum: stable across recomputation, partitions disjoint") {
    val a = q("dq_partition_checksum").collect()
    val b = q("dq_partition_checksum").collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    assert(a.map(_.getLong(1)).sum ==
      Tables.orders(spark, TestSpark.sf0001).count())
    // three partitions must not share a checksum (would defeat diffing)
    assert(a.map(_.getLong(2)).distinct.length == a.length)
  }
}
