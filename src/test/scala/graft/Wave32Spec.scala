package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the wave-32 additions, asserted on sf0.001. */
class Wave32Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("stat_krippendorff_alpha: unit count, bounds, noisy-but-real agreement") {
    val r = q("stat_krippendorff_alpha").collect().head
    val nDocs = Tables.documents(spark, TestSpark.sf0001).count()
    assert(r.getLong(0) == nDocs)
    val (dObs, dExp, alpha) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(dObs >= 0.0 && dObs <= 1.0)
    assert(dExp > 0.0 && dExp <= 1.0)
    assert(alpha <= 1.0 + 1e-9)
    // 1-in-5 noise coins on 3 raters leave most units unanimous:
    // agreement must beat chance clearly on this fixture
    assert(alpha > 0.3, s"expected substantial agreement, got $alpha")
    assert(math.abs((1.0 - dObs / dExp) - alpha) < 1e-5)
  }

  test("ds_typed_mapgroups: matches the declarative argmax") {
    val got = q("ds_typed_mapgroups").collect()
    val want = Tables.customer(spark, TestSpark.sf0001)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        max(struct(col("c_acctbal"), (-col("c_custkey")).as("nk"),
          col("c_name"))).as("m"))
      .select(col("c_mktsegment"), col("n"), col("m.c_acctbal"),
        col("m.c_name"))
      .orderBy("c_mktsegment").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getLong(1) == w.getLong(1))
      assert(g.getDouble(2) == w.getDouble(2))
      assert(g.getString(3) == w.getString(3))
    }
  }

  test("stream_agg_catchup: final sink state equals the batch aggregate") {
    val got = q("stream_agg_catchup").collect()
    val want = Tables.events(spark, TestSpark.sf0001)
      .withColumn("cents",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .orderBy("event_type").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getLong(1) == w.getLong(1))
      assert(math.abs(g.getDouble(2) - w.getLong(2) / 100.0) < 1e-9)
    }
  }
}
