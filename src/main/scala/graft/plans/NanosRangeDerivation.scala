package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: push time-range predicates through the nanos→micros
  * timestamp derivation down to the raw parquet column.
  *
  * Serves raw-nanos fixtures only: parquet TIMESTAMP(NANOS) is read as a
  * raw Long (`nanosAsLong`) that [[graft.sources.Tables.normalizeTs]]
  * turns into a usable timestamp via `timestamp_micros(nanos div 1000)`.
  * A START/STOP range on the derived column would otherwise reach the
  * scan as nothing but `IsNotNull` — at 100 TB that is a full-table scan
  * where row-group min/max pruning should have cut it to the queried days.
  * The rule is schema-gated by construction: it only fires on that exact
  * derivation pattern, so on native-timestamp fixtures (TIMESTAMP(MICROS)
  * since round 6, where Catalyst unwraps the NTZ cast and the built-in
  * parquet pushdown carries the bounds — pinned in PlansSpec) it is inert.
  *
  * For each conjunct `timestamp_micros(a div 1000) CMP literal`, this rule
  * ADDS the implied raw bound on `a` (the original predicate is kept):
  * from d = trunc(a/1000) and d >= L follows a >= L*1000 - 999, etc. The
  * ±999 ns slack makes the bound a necessary condition regardless of the
  * sign of `a` (trunc vs floor), so the rule is sound with no domain
  * annotation; exactness is irrelevant because the original conjunct
  * still filters post-scan. Bounds are skipped on Long overflow.
  *
  * Idempotent: bounds are only added when not already conjoined.
  */
object NanosRangeDerivation extends Rule[LogicalPlan] {

  /** timestamp_micros(attr div 1000) — the Tables.events derivation. */
  private object NanosToTs {
    def unapply(e: Expression): Option[Attribute] = e match {
      case m: MicrosToTimestamp => m.child match {
        case d: IntegralDivide => (d.left, d.right) match {
          case (a: Attribute, Literal(1000L, LongType)) => Some(a)
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
  }

  private def geBound(a: Attribute, micros: Long): Option[Expression] =
    try Some(GreaterThanOrEqual(a,
      Literal(Math.subtractExact(Math.multiplyExact(micros, 1000L), 999L), LongType)))
    catch { case _: ArithmeticException => None }

  private def leBound(a: Attribute, micros: Long): Option[Expression] =
    try Some(LessThanOrEqual(a,
      Literal(Math.addExact(Math.multiplyExact(micros, 1000L), 999L), LongType)))
    catch { case _: ArithmeticException => None }

  private def derive(conjunct: Expression): Seq[Expression] = conjunct match {
    case GreaterThanOrEqual(NanosToTs(a), Literal(us: Long, TimestampType)) =>
      geBound(a, us).toSeq
    case GreaterThan(NanosToTs(a), Literal(us: Long, TimestampType)) =>
      geBound(a, us + 1).toSeq
    case LessThanOrEqual(NanosToTs(a), Literal(us: Long, TimestampType)) =>
      leBound(a, us).toSeq
    case LessThan(NanosToTs(a), Literal(us: Long, TimestampType)) =>
      leBound(a, us - 1).toSeq
    case EqualTo(NanosToTs(a), Literal(us: Long, TimestampType)) =>
      geBound(a, us).toSeq ++ leBound(a, us).toSeq
    // literal-on-left mirrors
    case GreaterThanOrEqual(Literal(us: Long, TimestampType), NanosToTs(a)) =>
      leBound(a, us).toSeq
    case GreaterThan(Literal(us: Long, TimestampType), NanosToTs(a)) =>
      leBound(a, us - 1).toSeq
    case LessThanOrEqual(Literal(us: Long, TimestampType), NanosToTs(a)) =>
      geBound(a, us).toSeq
    case LessThan(Literal(us: Long, TimestampType), NanosToTs(a)) =>
      geBound(a, us + 1).toSeq
    case EqualTo(Literal(us: Long, TimestampType), NanosToTs(a)) =>
      geBound(a, us).toSeq ++ leBound(a, us).toSeq
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val derived = conjuncts.flatMap(derive)
      val missing = derived.filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (missing.isEmpty) f
      else Filter(missing.foldLeft(cond)((acc, m) => And(acc, m)), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
