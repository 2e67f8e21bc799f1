package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-frame codepoint statistics as ONE native pass over the string:
  * the text is cut into consecutive `frameLen`-codepoint frames (last
  * frame short) and each frame yields (fsum = Σ codepoint,
  * fsq = Σ codepoint², flen = frame length) — the shared primitive
  * under mm_audio_rms (frame RMS = sqrt(fsq/flen)) and mm_shot_detect
  * (frame feature = fsum). Replaces the doubly-nested
  * `transform(sequence(...), f -> aggregate(transform(sequence(...`
  * per-character lambdas that evaluated interpreted (~2 µs/char, the
  * SURVEY §7.10 lesson-#2 trap) with a primitive loop inside
  * whole-stage codegen; downstream HOFs then run over nf ≈ n/64
  * elements instead of n characters.
  *
  * Semantics match `ascii(substring(text, i, 1))` exactly (codepoint,
  * not byte — ASCII fast path walks bytes when numBytes == numChars).
  * Empty text yields an EMPTY array — unlike `sequence(0L, nf - 1)`,
  * which auto-reverses to [0,-1] when nf = 0 and makes the downstream
  * negative-length `slice` error (the r10 ADVICE #3 divergence); the
  * DuckDB oracle's generate_series(0,-1) is empty, so the native form
  * now agrees with the oracle on zero-length text by construction.
  */
case class FrameByteStats(child: Expression, frameLen: Int = 64)
    extends UnaryExpression {

  require(frameLen >= 1, "frameLen must be >= 1")

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fsum", LongType, nullable = false),
      StructField("fsq", LongType, nullable = false),
      StructField("flen", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "frame_byte_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"frame_byte_stats requires string, got $t")
  }

  def frames(s: UTF8String): GenericArrayData = {
    val nBytes = s.numBytes
    val ascii = nBytes == s.numChars
    // collect codepoints lazily: for the ASCII fast path iterate bytes
    // directly; otherwise walk the decoded string once
    if (ascii) {
      val bytes = s.getBytes
      val n = nBytes
      val nf = (n + frameLen - 1) / frameLen
      val out = new Array[Any](nf)
      var f = 0
      var i = 0
      while (f < nf) {
        val end = math.min(i + frameLen, n)
        var fsum = 0L
        var fsq = 0L
        val flen = (end - i).toLong
        while (i < end) {
          val c = (bytes(i) & 0xff).toLong
          fsum += c
          fsq += c * c
          i += 1
        }
        out(f) = new GenericInternalRow(Array[Any](fsum, fsq, flen))
        f += 1
      }
      new GenericArrayData(out)
    } else {
      val str = s.toString
      val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
      var i = 0
      val n = str.length
      var fsum = 0L
      var fsq = 0L
      var flen = 0L
      while (i < n) {
        val cp = str.codePointAt(i)
        i += Character.charCount(cp)
        fsum += cp.toLong
        fsq += cp.toLong * cp.toLong
        flen += 1L
        if (flen == frameLen.toLong) {
          buf += new GenericInternalRow(Array[Any](fsum, fsq, flen))
          fsum = 0L; fsq = 0L; flen = 0L
        }
      }
      if (flen > 0L)
        buf += new GenericInternalRow(Array[Any](fsum, fsq, flen))
      new GenericArrayData(buf.toArray)
    }
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else frames(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fbs", this, classOf[FrameByteStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.frames($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
