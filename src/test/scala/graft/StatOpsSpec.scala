package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mathematical invariants of the round-9 second-wave statistics /
  * time-series operators (stat_mutual_info, dq_psi_drift,
  * ts_markov_transitions, ts_interval_merge): each has a closed-form
  * property that must hold on ANY input, checked here on sf0.001,
  * plus a driver-side reference re-computation for the island merge.
  */
class StatOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stat_mutual_info: 0 <= MI <= min(H) and NMI in [0,1]") {
    val r = SparkEntry.queries("stat_mutual_info")(spark, TestSpark.sf0001)
      .head()
    val (mi, hx, hy, nmi) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(mi >= -1e-4, s"MI must be non-negative, got $mi")
    assert(mi <= math.min(hx, hy) + 1e-4,
      s"MI=$mi exceeds min marginal entropy ${math.min(hx, hy)}")
    assert(nmi >= -1e-4 && nmi <= 1 + 1e-4, s"NMI out of [0,1]: $nmi")
    assert(hx > 0 && hy > 0)
  }

  test("dq_psi_drift: probabilities sum to 1, every PSI term >= 0, total = sum") {
    val rows = SparkEntry.queries("dq_psi_drift")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.length == 10, "fixed 10-bin spine")
    val pRef = rows.map(_.getDouble(3)).sum
    val pCur = rows.map(_.getDouble(4)).sum
    // Laplace smoothing (n+0.5)/(N+5) telescopes to exactly 1 over 10 bins
    assert(math.abs(pRef - 1.0) < 1e-4, s"sum p_ref=$pRef")
    assert(math.abs(pCur - 1.0) < 1e-4, s"sum p_cur=$pCur")
    // (p-q)·ln(p/q) is sign-aligned: non-negative term-wise
    rows.foreach(r => assert(r.getDouble(5) >= -1e-9,
      s"bin ${r.getLong(0)}: negative PSI term ${r.getDouble(5)}"))
    val total = rows.head.getDouble(6)
    assert(rows.forall(r => r.getDouble(6) == total))
    assert(math.abs(rows.map(_.getDouble(5)).sum - total) < 1e-3)
  }

  test("ts_markov_transitions: rows are a stochastic matrix over observed transitions") {
    val rows = SparkEntry.queries("ts_markov_transitions")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    // Σ n over the matrix = Σ_user (n_events - 1)
    val ev = Tables.events(spark, TestSpark.sf0001)
    val perUser = ev.groupBy("user_id").agg(count(lit(1)).as("n")).collect()
    val wantTransitions = perUser.map(_.getLong(1) - 1).sum
    assert(rows.map(_.getLong(2)).sum == wantTransitions)
    // each from-row's probabilities sum to ~1 (rounded at 4dp per cell)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 0.01, s"$from: Σp=$p")
    }
  }

  test("ts_interval_merge matches a sequential reference merge") {
    val rows = SparkEntry.queries("ts_interval_merge")(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val span = 1800L * 1000000L
    val ref = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("s"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (uid, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3)).map(_._2)
        // sequential island merge
        var islands = List.empty[(Long, Long)] // (start, end) reversed
        sorted.foreach { s =>
          islands match {
            case (is, ie) :: tail if s <= ie =>
              islands = (is, math.max(ie, s + span)) :: tail
            case _ => islands = (s, s + span) :: islands
          }
        }
        val busy = islands.map { case (a, b) => b - a }.sum / 1000000L
        val maxI = islands.map { case (a, b) => b - a }.max / 1000000L
        uid -> (evs.size.toLong, islands.size.toLong, busy, maxI)
      }
    assert(rows.keySet == ref.keySet)
    ref.foreach { case (uid, want) =>
      assert(rows(uid) == want, s"user $uid: got ${rows(uid)} want $want")
    }
  }
}
