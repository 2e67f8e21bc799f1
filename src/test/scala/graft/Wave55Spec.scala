package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-55 addition (stat_assoc_rules). */
class Wave55Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stat_assoc_rules: symmetry, ranges, and lift identity") {
    val rows = SparkEntry.queries("stat_assoc_rules")(
      spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((ta, tb), (nab, sup, conf, lift)) =>
      assert(ta != tb)
      assert(nab >= 1)
      assert(sup > 0.0 && sup <= 1.0)
      assert(conf > 0.0 && conf <= 1.0)
      assert(lift > 0.0)
      // co-occurrence counts are symmetric even though conf/lift
      // confidence is directional
      assert(rows((tb, ta))._1 == nab, s"nab must be symmetric: $ta $tb")
      // lift is symmetric by algebra: nab*N/(na*nb)
      assert(math.abs(rows((tb, ta))._4 - lift) <= 1e-3,
        s"lift must be symmetric: $ta $tb")
    }
  }
}
