package graft.plans

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation
import org.apache.spark.sql.{sources => v1}

import graft.sources.{EventsApi, GraftEventsMicroBatchStream}

/** Streaming-path WHERE pushdown for the graft-events connector (S1 parity).
  *
  * Spark's V2ScanRelationPushDown is BATCH-ONLY: a `readStream` over a DSv2
  * source never has `pushFilters` called, so on the streaming path the WHERE
  * runs entirely in the stage above the source while the reference filters
  * server-side before streaming results out (qradar/qradarconnector.py:
  * 108-122 → etl.py:57-65). This rule closes that delta: it runs inside the
  * per-micro-batch optimizer (IncrementalExecution uses the session
  * optimizer, so injected rules fire for every batch), finds Filter nodes
  * sitting on a [[GraftEventsMicroBatchStream]] scan relation, translates
  * their conjuncts to V1 filters, and hands the connector-supported subset
  * to the live stream BEFORE the batch's reader factory is created.
  *
  * The plan itself is returned UNCHANGED: the Spark-side Filter stays and
  * re-checks every row, so this is purely an emission pruner — the partition
  * reader drops non-matching records before materializing them (exactly as
  * the batch reader does for trusted pushed filters), and correctness never
  * depends on the translation. Idempotent per batch: the same WHERE
  * translates to the same filter set, and the stream stores it by
  * replacement, not accumulation.
  *
  * The Expression→V1 translation below is local on purpose: Spark's own
  * `DataSourceStrategy.translateFilter` is `protected[sql]`, and the
  * connector only accepts the shapes [[EventsApi.supported]] lists, so a
  * partial translator over exactly those shapes is the honest dependency.
  */
object StreamingScanFilterPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case Filter(cond, rel: StreamingDataSourceV2ScanRelation) =>
        push(cond, rel)
      case Filter(cond, Project(_, rel: StreamingDataSourceV2ScanRelation)) =>
        push(cond, rel)
      case _ => ()
    }
    plan
  }

  private def push(cond: Expression, rel: StreamingDataSourceV2ScanRelation): Unit =
    rel.stream match {
      case s: GraftEventsMicroBatchStream =>
        val translated = splitConjuncts(cond).flatMap(translate)
        s.pushStreamingFilters(translated.filter(EventsApi.supported).toArray)
      case _ => ()
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def toScala(value: Any, dt: org.apache.spark.sql.types.DataType): Any =
    CatalystTypeConverters.convertToScala(value, dt)

  /** Catalyst predicate → V1 filter, for attribute-vs-literal shapes only.
    * Anything unrecognized translates to None and simply isn't pushed —
    * the Spark-side Filter still evaluates it.
    */
  private def translate(e: Expression): Option[v1.Filter] = e match {
    case EqualTo(a: Attribute, l: Literal) => Some(v1.EqualTo(a.name, toScala(l.value, l.dataType)))
    case EqualTo(l: Literal, a: Attribute) => Some(v1.EqualTo(a.name, toScala(l.value, l.dataType)))
    case EqualNullSafe(a: Attribute, l: Literal) =>
      Some(v1.EqualNullSafe(a.name, toScala(l.value, l.dataType)))
    case EqualNullSafe(l: Literal, a: Attribute) =>
      Some(v1.EqualNullSafe(a.name, toScala(l.value, l.dataType)))
    case GreaterThan(a: Attribute, l: Literal) =>
      Some(v1.GreaterThan(a.name, toScala(l.value, l.dataType)))
    case GreaterThan(l: Literal, a: Attribute) =>
      Some(v1.LessThan(a.name, toScala(l.value, l.dataType)))
    case GreaterThanOrEqual(a: Attribute, l: Literal) =>
      Some(v1.GreaterThanOrEqual(a.name, toScala(l.value, l.dataType)))
    case GreaterThanOrEqual(l: Literal, a: Attribute) =>
      Some(v1.LessThanOrEqual(a.name, toScala(l.value, l.dataType)))
    case LessThan(a: Attribute, l: Literal) =>
      Some(v1.LessThan(a.name, toScala(l.value, l.dataType)))
    case LessThan(l: Literal, a: Attribute) =>
      Some(v1.GreaterThan(a.name, toScala(l.value, l.dataType)))
    case LessThanOrEqual(a: Attribute, l: Literal) =>
      Some(v1.LessThanOrEqual(a.name, toScala(l.value, l.dataType)))
    case LessThanOrEqual(l: Literal, a: Attribute) =>
      Some(v1.GreaterThanOrEqual(a.name, toScala(l.value, l.dataType)))
    case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
      Some(v1.In(a.name,
        list.map { case l: Literal => toScala(l.value, l.dataType) }.toArray))
    case InSet(a: Attribute, hset) =>
      Some(v1.In(a.name, hset.map(toScala(_, a.dataType)).toArray))
    case IsNull(a: Attribute)    => Some(v1.IsNull(a.name))
    case IsNotNull(a: Attribute) => Some(v1.IsNotNull(a.name))
    case StartsWith(a: Attribute, Literal(p, org.apache.spark.sql.types.StringType)) =>
      Some(v1.StringStartsWith(a.name, p.toString))
    case EndsWith(a: Attribute, Literal(p, org.apache.spark.sql.types.StringType)) =>
      Some(v1.StringEndsWith(a.name, p.toString))
    case Contains(a: Attribute, Literal(p, org.apache.spark.sql.types.StringType)) =>
      Some(v1.StringContains(a.name, p.toString))
    case And(l, r) =>
      for (lf <- translate(l); rf <- translate(r)) yield v1.And(lf, rf)
    case Or(l, r) =>
      for (lf <- translate(l); rf <- translate(r)) yield v1.Or(lf, rf)
    case Not(c) => translate(c).map(v1.Not)
    case _      => None
  }
}
