package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The AccelerateCosine optimizer rule (registered here through
  * `experimental.extraOptimizations`, the runtime twin of
  * GraftExtensions' injectOptimizerRule).
  */
class AccelerateCosineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.AccelerateCosine
    try f finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == graft.plans.AccelerateCosine)
  }

  private def vecs = Tables.embeddings(spark, TestSpark.sf0001)
    .select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  test("HOF cosine pattern is rewritten to the native expression") {
    withRule {
      val q = vecs.limit(50).crossJoin(
          vecs.limit(1).select(col("v").as("qv")))
        .select(hofCosine(col("v"), col("qv")).as("sim"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cosine_sim"), optimized)
    }
  }

  test("rewrite preserves results exactly") {
    val q = () => vecs.limit(100).crossJoin(
        vecs.filter(col("vec_id") === 3).select(col("v").as("qv")))
      .select(col("vec_id"), hofCosine(col("v"), col("qv")).as("sim"))
      .orderBy("vec_id")
    val plain = q().collect()
    val accel = withRule(q().collect())
    assert(plain.sameElements(accel))
  }

  test("non-dot lambdas are NOT rewritten (params matched by exprId)") {
    withRule {
      // (x, y) -> x * x: same shape as a dot product to a naive matcher,
      // semantically different — must survive the optimizer untouched.
      def squareFold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, _) => x * x), lit(0.0), (acc, v) => acc + v)
      val q = vecs.limit(10).crossJoin(vecs.limit(1).select(col("v").as("qv")))
        .select((squareFold(col("v"), col("qv")) /
          (sqrt(squareFold(col("v"), col("v"))) * sqrt(squareFold(col("qv"), col("qv")))))
          .as("notsim"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("cosine_sim"))

      // (acc, v) -> v + v in the fold position: also must not match.
      def doubleFold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (_, v) => v + v)
      val q2 = vecs.limit(10).crossJoin(vecs.limit(1).select(col("v").as("qv")))
        .select((doubleFold(col("v"), col("qv")) /
          (sqrt(doubleFold(col("v"), col("v"))) * sqrt(doubleFold(col("qv"), col("qv")))))
          .as("notsim"))
      assert(!q2.queryExecution.optimizedPlan.toString.contains("cosine_sim"))
    }
  }

  test("zero-norm vectors keep Divide's per-mode semantics through the rewrite") {
    import spark.implicits._
    val mk = () => Seq((Array(0.0, 0.0), Array(1.0, 2.0)),
        (Array(1.0, 0.0), Array(1.0, 0.0)))
      .toDF("a", "b")
      .select(hofCosine(col("a"), col("b")).as("sim"))
    // legacy mode: null on both the plain and the rewritten path
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val plain = mk().collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val accel = withRule {
        mk().collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      }
      assert(plain.toSeq == accel.toSeq)
      assert(plain.head.isEmpty) // zero-norm row is null on both paths
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    // ANSI mode: DIVIDE_BY_ZERO on both paths
    val ePlain = intercept[Exception](mk().collect())
    assert(ePlain.getMessage.contains("DIVIDE_BY_ZERO"), ePlain.getMessage)
    val eAccel = intercept[Exception](withRule(mk().collect()))
    assert(eAccel.getMessage.contains("DIVIDE_BY_ZERO"), eAccel.getMessage)
  }

  test("nullable-element arrays rewrite AND keep null-poisoning semantics") {
    import spark.implicits._
    val mk = () => Seq((Some(1.0), Some(2.0)), (None, Some(3.0)))
      .toDF("x", "y")
      .select(array(col("x"), col("y")).as("a"), array(col("y"), col("x")).as("b"))
      .select(hofCosine(col("a"), col("b")).as("sim"))
    // (literal inputs constant-fold to a LocalRelation, so assert on
    // values: the null-poisoned row must survive the rewrite)
    val plain = mk().collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val accel = withRule {
      mk().collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    }
    assert(plain.toSeq == accel.toSeq)
    assert(plain.exists(_.isEmpty))
  }
}
