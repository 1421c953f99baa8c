package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule (SURVEY §4 optional v2): derive range bounds from CIDR
  * mask-compares so they reach the parquet scan.
  *
  * `INCIDR` compiles to `(ip & mask) = net`. A masked compare cannot be
  * pushed into a columnar scan, so at 100 TB the filter runs post-scan and
  * min/max row-group pruning never fires. For a contiguous CIDR mask and a
  * value in the IPv4 domain [0, 2^32), `(x & mask) = net` is equivalent to
  * `net <= x <= net | ~mask`; the bounds are ADDED as conjuncts (the
  * original mask-compare is kept), so parquet pushes the bounds and prunes
  * row groups on the packed-IP column's min/max statistics.
  *
  * Soundness: for an arbitrary 64-bit value the equivalence fails (e.g.
  * x = net + 2^32 satisfies the mask-compare but not the bounds), so the
  * rule ONLY fires on attributes annotated with the `graft.ipv4` metadata
  * flag — the engine's promise, made where the packed column is produced
  * ([[graft.functions.Net.packedIpv4Metadata]]), that values lie in the
  * IPv4 domain. Unannotated columns are never touched.
  *
  * Idempotent: bounds are only added when not already conjoined (fixed-point
  * optimizer batches re-run rules).
  */
object CidrRangeDerivation extends Rule[LogicalPlan] {

  val Ipv4DomainFlag = "graft.ipv4"

  /** Contiguous high-bit IPv4 mask (a real CIDR mask, not arbitrary bits). */
  private def isCidrMask(m: Long): Boolean =
    m > 0 && m <= 0xFFFFFFFFL && {
      val inv = ~m & 0xFFFFFFFFL
      (inv & (inv + 1)) == 0 // low bits contiguous
    }

  private def bounds(attr: Expression, net: Long, mask: Long): Seq[Expression] = {
    val hi = net | (~mask & 0xFFFFFFFFL)
    Seq(
      GreaterThanOrEqual(attr, Literal(net, LongType)),
      LessThanOrEqual(attr, Literal(hi, LongType)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val derived = conjuncts.flatMap {
        case EqualTo(BitwiseAnd(attr: Attribute, Literal(mask: Long, LongType)),
                     Literal(net: Long, LongType))
            if isCidrMask(mask) && attr.metadata.contains(Ipv4DomainFlag) =>
          bounds(attr, net, mask)
        case EqualTo(Literal(net: Long, LongType),
                     BitwiseAnd(attr: Attribute, Literal(mask: Long, LongType)))
            if isCidrMask(mask) && attr.metadata.contains(Ipv4DomainFlag) =>
          bounds(attr, net, mask)
        case _ => Nil
      }
      val missing = derived.filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (missing.isEmpty) f
      else Filter(missing.foldLeft(cond)((acc, m) => And(acc, m)), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** SparkSessionExtensions entry point: enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CidrRangeDerivation)
    ext.injectOptimizerRule(_ => NanosRangeDerivation)
    ext.injectOptimizerRule(_ => StreamingScanFilterPushdown)
    ext.injectOptimizerRule(_ => RollupNavigation)
  }
}
