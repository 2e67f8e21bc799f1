package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003) as
  * ONE native pass over the cleaned document: base-131 rolling hash of
  * every `gramLen`-char gram, minimum over each `window` consecutive
  * hashes, distinct selected values returned sorted ascending.
  *
  * Semantics are EXACTLY the HOF form the DuckDB oracle runs —
  * h(i) = Horner base-131 over char codes i..i+7, fp(w) =
  * least(h(w..w+3)), then distinct — but where the three nested
  * higher-order functions evaluate interpreted per element (measured
  * 2.4 s at sf0.1 for the hash/min stage alone, ~2 µs per gram), this
  * expression runs primitive-long loops inside whole-stage codegen:
  *
  *   - the gram hash is a true Karp–Rabin ROLLING recurrence
  *     h' = (h − c·131⁷)·131 + c_new — O(1) per gram, not O(gramLen);
  *     exact in Long (max value 122·Σ131^j ≈ 8·10^16), no modulus;
  *     B = 131 > any char code makes the code INJECTIVE on grams;
  *   - the sliding min is a monotonic-deque scan — O(1) amortized per
  *     window, not O(window);
  *   - distinct = sort + adjacent-dedupe of the ~n/2 selected values.
  *
  * Precondition: input is already lowercased and stripped to [a-z]
  * (single-byte chars), as llm_winnowing's regexp_replace guarantees;
  * byte values are used as char codes. Input shorter than
  * gramLen + window − 1 chars (no complete window) yields an empty
  * array, matching the windowed form which emits no selected rows.
  */
case class WinnowFingerprints(child: Expression,
    gramLen: Int = 8, window: Int = 4)
    extends UnaryExpression {

  require(gramLen >= 1 && window >= 1, "gramLen and window must be >= 1")

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires string, got $t")
  }

  private val B = 131L
  // B^(gramLen-1), the drop-term multiplier of the rolling recurrence
  private val bTop: Long = {
    var v = 1L; var i = 1
    while (i < gramLen) { v *= B; i += 1 }
    v
  }

  def winnow(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val nGrams = n - gramLen + 1
    val nWins = nGrams - window + 1
    if (nWins <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < gramLen) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    hs(0) = h
    var g = 1
    while (g < nGrams) {
      h = (h - (bytes(g - 1) & 0xffL) * bTop) * B + (bytes(g + gramLen - 1) & 0xffL)
      hs(g) = h
      g += 1
    }
    // monotonic deque of indices: head is the argmin of the current
    // window; values enter from the right evicting larger-or-equal
    // tails (>= keeps the LEFTMOST index of equal values at the head,
    // irrelevant for min-by-VALUE selection but cheap determinism)
    val deque = new Array[Int](nGrams)
    var dHead = 0
    var dTail = 0 // exclusive
    val sel = new Array[Long](nWins)
    var w = 0
    var idx = 0
    while (idx < nGrams) {
      while (dTail > dHead && hs(deque(dTail - 1)) >= hs(idx)) dTail -= 1
      deque(dTail) = idx; dTail += 1
      if (deque(dHead) <= idx - window) dHead += 1
      if (idx >= window - 1) { sel(w) = hs(deque(dHead)); w += 1 }
      idx += 1
    }
    java.util.Arrays.sort(sel)
    var uniq = 1
    var k = 1
    while (k < nWins) { if (sel(k) != sel(k - 1)) uniq += 1; k += 1 }
    val out = new Array[Long](uniq)
    out(0) = sel(0)
    var o = 1
    k = 1
    while (k < nWins) {
      if (sel(k) != sel(k - 1)) { out(o) = sel(k); o += 1 }
      k += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else winnow(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.winnow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
