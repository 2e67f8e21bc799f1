package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1-shaped smoke: flagship entry, every declared query executes on
  * sf0.001, and the contract maps are mutually consistent.
  */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qk)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query names are unique") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct).distinct}")
  }

  test("every declared query executes on sf0.001") {
    val failures = SparkEntry.all.flatMap { q =>
      try { q.fn(spark, TestSpark.sf0001).count(); None }
      catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
