package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native Lloyd-round aggregate (CellVectorSums) must be
  * BIT-IDENTICAL to the posexplode + DECIMAL(38,20) path it replaces —
  * the determinism contract that lets the fast path be the default
  * without touching any oracle.
  */
class KMeansAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def embs = Tables.embeddings(spark, TestSpark.sf0001)

  private def codebook(native: Boolean, k: Int): Array[Array[Double]] = {
    spark.conf.set(graft.api.Similarity.KmeansNativeAggKey, native.toString)
    try {
      graft.api.Similarity.clearCodebookCache()
      graft.api.Similarity.kmeansCodebook(embs, "vec_id", "embedding", k = k)
    } finally spark.conf.unset(graft.api.Similarity.KmeansNativeAggKey)
  }

  test("native 128-bit Lloyd aggregate is bit-identical to the decimal path") {
    for (k <- Seq(16, 64)) {
      val fast = codebook(native = true, k)
      val slow = codebook(native = false, k)
      assert(fast.length == slow.length)
      fast.indices.foreach { c =>
        fast(c).indices.foreach { d =>
          // exact bit equality, not a tolerance: the native path sums
          // the same decimal-rounded elements as 128-bit integers
          assert(java.lang.Double.doubleToRawLongBits(fast(c)(d)) ==
            java.lang.Double.doubleToRawLongBits(slow(c)(d)),
            s"k=$k cell=$c dim=$d: ${fast(c)(d)} != ${slow(c)(d)}")
        }
      }
    }
    graft.api.Similarity.clearCodebookCache()
  }

  test("CellVectorSums.mean reconstructs the decimal mean across word boundaries") {
    import graft.functions.CellVectorSums.mean
    // a sum whose unscaled value exceeds one 64-bit word:
    // 0.5 * 10^20 * 400 = 2*10^22 > 2^64 ≈ 1.8*10^19
    val one = java.math.BigDecimal.valueOf(0.5)
      .setScale(20, java.math.RoundingMode.HALF_UP).unscaledValue()
    val total = one.multiply(java.math.BigInteger.valueOf(400))
    val hi = total.shiftRight(64).longValue()
    val lo = total.longValue()
    assert(mean(hi, lo, 400) == 0.5)
    // negative sums round-trip the two's-complement split too
    val neg = total.negate()
    assert(mean(neg.shiftRight(64).longValue(), neg.longValue(), 400) == -0.5)
  }
}
