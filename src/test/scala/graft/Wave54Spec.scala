package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-54 addition (llm_lsh_recall_audit). */
class Wave54Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("llm_lsh_recall_audit: found is a subset; recall in range") {
    val r = SparkEntry.queries("llm_lsh_recall_audit")(
      spark, TestSpark.sf0001).collect().head
    val (nSlice, truePairs, found, cands, recall) = (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(nSlice > 0)
    assert(found <= truePairs, "found pairs must be true pairs")
    assert(found <= cands, "found pairs must be candidates")
    assert(recall >= 0.0 && recall <= 1.0)
    // the fixture's near-dups are doc-level clones (jaccard ~1.0);
    // banded LSH cannot miss identical signatures
    assert(recall == 1.0,
      s"identical-signature near-dups must all be found: recall=$recall")
  }
}
