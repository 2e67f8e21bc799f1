package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Range-bucket id of a double against a sorted literal boundary array:
  * the count of boundaries `b` with `value >= b` (the upper-bound
  * insertion index), found by binary search. NULL (and NaN) input maps
  * to bucket 0 — the contract `graft.api.Ranking` relies on for
  * ascending nulls-first sorts.
  *
  * Why a native expression and not `aggregate(lit(bounds), …)` or a
  * `when`-chain (both tried):
  *   - the when-chain fold is (p−1) nested additions deep — codegen
  *     method-size blowup / interpreted fallback at p = thousands
  *     (round-6 advice);
  *   - the HOF form hits a correctness trap: a lambda body's captured
  *     outer attribute is NOT part of `ArrayAggregate.references` when
  *     the array argument is a literal, so constraint inference at the
  *     rank/offsets self-join pushes an inferred filter mentioning the
  *     LEFT branch's attribute into the RIGHT branch, which fails
  *     runtime binding (`INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND`; caught by
  *     RankingSpec when round 7 switched to the HOF form).
  * Here the boundary array rides as ONE referenced object
  * (`ctx.addReferenceObj`, the [[NearestCells]] codebook precedent),
  * the generated code is a single static-shaped call — O(1) codegen
  * size in p — and lookup is O(log p) instead of the linear scan both
  * rejected forms pay.
  */
case class BucketIndex(child: Expression, bounds: Array[Double])
    extends UnaryExpression {

  require(bounds.nonEmpty, "need at least one boundary")

  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_index"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bucket_index requires double, got $t")
  }

  /** Upper bound by binary search: first index with bounds(i) > v.
    * `bounds(mid) <= v` is false for NaN, so NaN lands in bucket 0 —
    * identical to the `v >= b` comparison count it replaces.
    */
  def bucketOf(v: Double): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) 0 else bucketOf(a.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketIndex", this, classOf[BucketIndex].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        int ${ev.value} = ${childGen.isNull} ? 0 : $ref.bucketOf(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
