package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: sorted-interval lookup of a packed value —
  * the shuffle-free FULLNETWORKNAME for hierarchies too large to compile
  * into a when-chain (SURVEY §2.3 J1; the reference resolves
  * `FULLNETWORKNAME(ip)` against QRadar's network hierarchy,
  * qradar/input/queries.json:2-3).
  *
  * `los(i)` are the ascending start points of disjoint [lo, hi) intervals
  * partitioning the whole key space ([[graft.ops.Lookups.flattenHierarchy]]
  * pre-resolves longest-prefix-match into this form at plan-build time);
  * `names(i)` is the label of interval i, null for uncovered gaps. The
  * probe is one branch-free binary search per row — O(log m) with m a few
  * thousand, all inside whole-stage codegen, no join, no shuffle, no
  * per-row allocation. The arrays ride to executors as generated-class
  * references (broadcast-variable scale: 16 B/interval + names).
  */
case class IntervalLookup(child: Expression, los: Array[Long],
                          names: Array[UTF8String])
  extends UnaryExpression {

  require(los.length == names.length && los.length > 0,
    "interval table must be non-empty and aligned")

  // Array fields compare by reference under case-class equality, which
  // would make two identical lookups semantically unequal — defeating
  // Catalyst canonicalization (common-subexpression elimination, exchange
  // reuse). Compare contents.
  override def equals(other: Any): Boolean = other match {
    case that: IntervalLookup =>
      child == that.child &&
        java.util.Arrays.equals(los, that.los) &&
        java.util.Arrays.equals(names.asInstanceOf[Array[AnyRef]],
          that.names.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(los)) +
      java.util.Arrays.hashCode(names.asInstanceOf[Array[AnyRef]])

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_interval_lookup"

  override def nullSafeEval(input: Any): Any = {
    val i = IntervalLookup.floorIndex(los, input.asInstanceOf[Long])
    if (i < 0) null else names(i)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val losRef = ctx.addReferenceObj("intervalLos", los, "long[]")
    val namesRef = ctx.addReferenceObj("intervalNames", names,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val c = child.genCode(ctx)
    val idx = ctx.freshName("ivlIdx")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
        if (!${c.isNull}) {
          int $idx = graft.plans.IntervalLookup.floorIndex($losRef, ${c.value});
          if ($idx >= 0 && $namesRef[$idx] != null) {
            ${ev.value} = $namesRef[$idx];
            ${ev.isNull} = false;
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): IntervalLookup =
    copy(child = newChild)
}

object IntervalLookup {
  /** Index of the greatest `los(i) <= v`, -1 if v precedes every interval.
    * Shared by the interpreted and generated paths (one implementation).
    */
  def floorIndex(los: Array[Long], v: Long): Int = {
    val i = java.util.Arrays.binarySearch(los, v)
    if (i >= 0) i else -i - 2
  }
}
