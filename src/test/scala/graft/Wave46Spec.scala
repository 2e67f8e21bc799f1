package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-46 additions (dq_id_gaps,
  * llm_template_census).
  */
class Wave46Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("dq_id_gaps: counts reconcile; fixture ids are dense and unique") {
    val rows = q("dq_id_gaps").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("documents", "events", "orders"))
    rows.foreach { r =>
      val (n, ids, miss, dup) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ids <= n)
      assert(miss >= 0 && dup >= 0)
      assert(dup == n - ids, "duplicate identity must hold")
      // the generated fixtures use dense unique ids
      assert(miss == 0 && dup == 0, s"fixture ids not dense: $r")
    }
  }

  test("llm_template_census: ranked by size, counts bounded") {
    val rows = q("llm_template_census").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getLong(0)).toSeq ==
      (1L to rows.length).toSeq, "ranks must be 1..k")
    val sizes = rows.map(_.getLong(2))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b },
      "census must be size-descending")
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(2),
      "source diversity cannot exceed cluster size"))
  }
}
