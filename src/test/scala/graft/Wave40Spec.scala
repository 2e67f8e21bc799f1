package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-40 additions (export_txn_merge_upsert,
  * dq_ks_drift).
  */
class Wave40Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("export_txn_merge_upsert: COW merge accounting") {
    val rows = q("export_txn_merge_upsert").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("F", "N", "O", "P"))
    // copy-on-write: every status lives in exactly ONE file post-merge
    rows.values.foreach { case (nf, _, _) => assert(nf == 1L) }
    // the insert branch created exactly one row per nation at 50.00
    assert(rows("N") == ((1L, 25L, 1250.0)))
    // update branch preserved P's row count (upsert, not append)
    val pOrig = Tables.orders(spark, TestSpark.sf0001)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "P")
      .count()
    assert(rows("P")._2 == pOrig, "merge must not change matched count")
  }

  test("dq_ks_drift: valid statistic range, flag consistency") {
    val rows = q("dq_ks_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, dstat, drifted) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(na > 0 && nb > 0, "both drift windows must be populated")
      assert(dstat >= 0.0 && dstat <= 1.0, s"KS D out of range: $dstat")
      assert(drifted == (dstat > 0.05), "flag must match rounded D")
    }
  }
}
