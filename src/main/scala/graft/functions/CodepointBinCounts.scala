package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row codepoint-bin histogram as ONE native pass over the string:
  * bin(c) = codepoint(c) / width, counts returned as a bin-ascending
  * array of (bin, cnt) structs — the in-row pre-aggregation that lets
  * mm_pixel_histogram explode ≤ |distinct bins| rows per document
  * instead of ONE ROW PER CHARACTER (the r10 verdict watch item: the
  * per-char explode pushed ~9M rows at sf0.1 through the exchange,
  * and the `transform(sequence(...), i -> ascii(substring(...)))`
  * lambda evaluated interpreted at ~2 µs/char — the SURVEY §7.10
  * lesson-#2 trap, same recipe as [[WinnowFingerprints]]).
  *
  * Semantics match `ascii(substring(text, i, 1)) div width` exactly:
  * `substring` slices by codepoint and `ascii` returns the first
  * CODEPOINT (not byte), so bins are unbounded above for non-ASCII
  * text. The hot path (pure-ASCII rows, detected via
  * numBytes == numChars) walks raw bytes; multi-byte rows walk
  * codePointAt. Bins < 64·width live in a flat array; rarer high
  * codepoints spill to a TreeMap, keeping per-row memory O(distinct
  * bins) and the output sorted without a comparator pass.
  */
case class CodepointBinCounts(child: Expression, width: Int = 16)
    extends UnaryExpression {

  require(width >= 1, "width must be >= 1")

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bin", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "codepoint_bin_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"codepoint_bin_counts requires string, got $t")
  }

  private val SmallBins = 64

  def hist(s: UTF8String): GenericArrayData = {
    val small = new Array[Long](SmallBins)
    var big: java.util.TreeMap[java.lang.Long, java.lang.Long] = null
    def add(cp: Int): Unit = {
      val b = cp / width
      if (b < SmallBins) small(b) += 1L
      else {
        if (big == null) big = new java.util.TreeMap()
        val k = java.lang.Long.valueOf(b.toLong)
        val cur = big.get(k)
        big.put(k, if (cur == null) 1L else cur + 1L)
      }
    }
    val nBytes = s.numBytes
    if (nBytes == s.numChars) {
      // pure-ASCII fast path: every byte IS the codepoint
      val bytes = s.getBytes
      var i = 0
      while (i < nBytes) { add(bytes(i) & 0xff); i += 1 }
    } else {
      val str = s.toString
      var i = 0
      val n = str.length
      while (i < n) {
        val cp = str.codePointAt(i)
        add(cp)
        i += Character.charCount(cp)
      }
    }
    var nOut = if (big == null) 0 else big.size
    var b = 0
    while (b < SmallBins) { if (small(b) > 0L) nOut += 1; b += 1 }
    val out = new Array[Any](nOut)
    var o = 0
    b = 0
    while (b < SmallBins) {
      if (small(b) > 0L) {
        out(o) = new GenericInternalRow(Array[Any](b.toLong, small(b)))
        o += 1
      }
      b += 1
    }
    if (big != null) {
      val it = big.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out(o) = new GenericInternalRow(
          Array[Any](e.getKey.longValue(), e.getValue.longValue()))
        o += 1
      }
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else hist(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cbc", this, classOf[CodepointBinCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hist($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
