package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking primitives.
  *
  * A global `row_number()`/`ntile()` window over an unpartitioned frame
  * funnels EVERY row through one window partition — the classic
  * single-task sort that stops scaling at ~10⁸ rows. The primitives
  * here produce the exact same numbers with a range-partitioned
  * two-pass shape instead:
  *
  *   1. `repartitionByRange` on the sort key (sampled boundaries — a
  *      parallel shuffle, no global sort),
  *   2. a per-partition local `row_number` (windows partitioned by the
  *      physical range id, so every sort is partition-local),
  *   3. per-partition row counts prefix-summed into offsets — a
  *      partition-count-sized aggregate (≤ a few thousand rows at any
  *      scale) that is broadcast back, so global rank = offset + local
  *      rank.
  *
  * The only single-partition work is the prefix sum over the per-range
  * counts — O(shuffle partitions) rows, driver-trivial forever. The
  * result is EXACT (not approximate): range boundaries affect only how
  * rows are grouped, never their global rank, so the sampling inside
  * `repartitionByRange` cannot perturb results when the sort key is
  * total (pass a unique tiebreak column, same rule as SURVEY §7.4).
  */
object Ranking {

  /** `df` plus `rnCol` = exact 1-based global row number under
    * `sortCols`, and `nCol` = the total row count (both LongType).
    * Range-partitioned two-pass; see object doc. `sortCols` must be a
    * total order (include a unique tiebreak).
    */
  def withGlobalRowNumber(df: DataFrame, sortCols: Seq[Column],
      rnCol: String = "__rn", nCol: String = "__n",
      partitions: Int = 0): DataFrame = {
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // __pid is the RANGE bucket id: deterministic given the data (range
    // boundaries are sampled with Spark's fixed per-partition seeds), so
    // the two consumers below agree on it even if the exchange is not
    // reused.
    val ranged = df.repartitionByRange(p, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val local = ranged.withColumn("__lrn", row_number().over(wLocal).cast("long"))
    // per-range counts → exclusive prefix sum; ≤ p rows, so the
    // unpartitioned window here is over a driver-trivial aggregate, not
    // the input (the whole point of the two-pass shape)
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn(nCol, sum("__cnt").over(wAll))
      .select(col("__pid"), col("__off"), col(nCol))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rnCol, col("__lrn") + col("__off"))
      .drop("__pid", "__lrn")
  }

  /** `df` plus `tileCol` = exact `NTILE(tiles)` under `sortCols`
    * (LongType, 1-based), without a global single-partition window.
    *
    * NTILE's front-loaded-remainder rule, applied to the two-pass
    * global row number: with n rows, q = n div tiles and r = n mod
    * tiles, the first r tiles hold q+1 rows and the rest hold q — all
    * integral arithmetic, so this matches the window function
    * bit-for-bit on any engine.
    */
  def ntileExact(df: DataFrame, tiles: Int, sortCols: Seq[Column],
      tileCol: String = "__ntile"): DataFrame = {
    require(tiles > 0, s"tiles must be positive, got $tiles")
    val withRn = withGlobalRowNumber(df, sortCols)
    // floor-division via doubles is exact below 2^53 rows — 9×10^15,
    // comfortably above any corpus (100 TB ≈ 10^12-10^13 rows)
    def fdiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val q = fdiv(col("__n"), lit(tiles))
    val r = col("__n") % lit(tiles)
    val head = r * (q + lit(1)) // rows living in the size-(q+1) tiles
    val rn0 = col("__rn") - lit(1)
    val tile = when(rn0 < head, fdiv(rn0, q + lit(1)))
      .otherwise(r + fdiv(rn0 - head, q))
    withRn.withColumn(tileCol, (tile + lit(1)).cast("long"))
      .drop("__rn", "__n")
  }
}
