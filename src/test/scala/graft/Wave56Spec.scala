package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-56 addition (dq_coverage_sla). */
class Wave56Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dq_coverage_sla: coverage and gap accounting per type") {
    val rows = SparkEntry.queries("dq_coverage_sla")(
      spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    val span = rows.head.getLong(2)
    rows.foreach { r =>
      val (active, sp, cov, gap) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
      assert(sp == span, "span is global, identical on every row")
      assert(active >= 1 && active <= sp)
      assert(cov > 0.0 && cov <= 1.0)
      assert(gap >= 1, "consecutive active hours have gap >= 1")
      // max gap cannot exceed the silent mass plus one step
      assert(gap <= sp - active + 1,
        s"gap $gap impossible with $active active of $sp hours")
    }
  }
}
