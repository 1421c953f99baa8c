package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** AGGREGATE NAVIGATION — the engine-native analog of the reference's
  * "query the rollup, not raw" architecture (its warehouse delegates
  * hourly aggregation to a SummingMergeTree table and every dashboard
  * query reads the rollup, clickhouse/clickhouse.py:70-81). Here the
  * same navigation is an OPTIMIZER rule: a groupBy-SUM over the raw
  * events frame whose grouping is `date_trunc` at hour or coarser plus a
  * subset of the registered rollup's dimensions rewrites onto the
  * MATERIALIZED hourly rollup — sums of hourly sums re-aggregate
  * exactly for integer/decimal measures (double measures re-associate,
  * moving the last ulps — the same contract every distributed double
  * sum in the engine carries, absorbed by the round-at-display
  * discipline), while the scan drops from O(events) to O(hourly keys).
  *
  * Matching is conservative by construction — every check must pass or
  * the plan is left untouched:
  *  - the aggregate's child must trace to the SAME base relation as the
  *    registered raw frame (file-source root paths equal), through
  *    Project/SubqueryAlias nodes only (a Filter between aggregate and
  *    scan blocks navigation: the rollup cannot replay row-level
  *    predicates);
  *  - each referenced column (time, dims, measure) must trace to the
  *    SAME canonicalized expression over the base relation as the
  *    registered frame's column (so renames/normalization projections
  *    match, but any semantic drift does not);
  *  - the time grouping must be `date_trunc` at {hour, day, week, month,
  *    quarter, year} of the registered time column — truncating the
  *    rollup's hour-start column at the same level is then identical;
  *  - aggregates must be plain SUMs of the registered measure (no
  *    DISTINCT, no FILTER) — the only shape hourly partial sums can
  *    serve exactly;
  *  - the STALENESS GATE: the raw directory's listing signature
  *    (file count, total bytes, max mtime) must equal the signature
  *    captured when the rollup was registered — a landed batch flips the
  *    signature and the rule stands down until re-registration (the
  *    local-FS stand-in for a table format's commit version; wired to
  *    [[graft.ops.Rollup.refreshAdditive]]'s refresh in deployment).
  *
  * The rewrite keeps every output name AND ExprId (aliases re-point at
  * the rollup's columns under the original ids), so parent operators
  * resolve unchanged — the navigated plan is a drop-in subtree.
  */
object RollupNavigation extends Rule[LogicalPlan] {

  /** Hour-or-coarser `date_trunc` levels (rollup grain = hour). */
  private val CoarserLevels =
    Set("hour", "day", "week", "month", "quarter", "year", "mon", "mm", "dd")

  final case class Registration(
      rootPaths: Set[String],
      tsTraced: Expression,
      dimsTraced: Map[String, Expression], // rollup dim col name -> traced raw expr
      measureTraced: Expression,
      rollupRelation: LogicalRelation,
      hourCol: String,
      sumCol: String,
      rawSignature: String)

  private val regs = TrieMap.empty[String, Registration]

  /** Listing signature of the raw store (count, bytes, max mtime). */
  private def signature(spark: SparkSession, paths: Set[String]): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.toSeq.sorted.map { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      var n = 0L; var bytes = 0L; var mt = 0L
      if (fs.exists(hp)) {
        val it = fs.listFiles(hp, true)
        while (it.hasNext) {
          val f = it.next()
          n += 1; bytes += f.getLen; mt = math.max(mt, f.getModificationTime)
        }
      }
      s"$p:$n:$bytes:$mt"
    }.mkString(";")
  }

  /** Trace `e` through Project/SubqueryAlias down to an expression over
    * the base file relation, with base attributes POSITION-normalized
    * (BoundReference) so traced expressions compare across plan
    * instances. Returns (root paths, normalized canonical expr). */
  private def trace(plan: LogicalPlan, e: Expression): Option[(Set[String], Expression)] =
    plan match {
      case p: Project =>
        var ok = true
        val replaced = e.transformUp {
          case a: AttributeReference =>
            p.projectList.find(_.exprId == a.exprId) match {
              case Some(al: Alias) => al.child
              case Some(ar: AttributeReference) => ar
              case _ => ok = false; a
            }
        }
        if (ok) trace(p.child, replaced) else None
      case s: SubqueryAlias => trace(s.child, e)
      case r @ LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
        var ok = true
        val bound = e.transformUp {
          case a: AttributeReference =>
            val i = r.output.indexWhere(_.exprId == a.exprId)
            if (i < 0) { ok = false; a }
            else BoundReference(i, a.dataType, a.nullable)
        }
        if (ok)
          Some((h.location.rootPaths.map(_.toString).toSet, bound.canonicalized))
        else None
      case _ => None
    }

  /** Register a materialized hourly rollup for `raw`. `rollupPath` holds
    * parquet with `hourCol` (hour-start timestamp), the dim columns
    * (same names as in `raw`), and `sumCol` = hourly SUM of
    * `measureCol`. Captures the raw store's current signature — the
    * freshness token. Re-registering after a refresh re-arms the rule.
    */
  def register(spark: SparkSession, raw: DataFrame, tsCol: String,
               dims: Seq[String], measureCol: String,
               rollupPath: String, hourCol: String, sumCol: String): Unit = {
    val plan = raw.queryExecution.analyzed
    def attrOf(n: String) = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"RollupNavigation: no column $n in raw frame"))
    val ts = trace(plan, attrOf(tsCol))
    val ms = trace(plan, attrOf(measureCol))
    val ds = dims.map(d => d -> trace(plan, attrOf(d)))
    require(ts.nonEmpty && ms.nonEmpty && ds.forall(_._2.nonEmpty),
      "RollupNavigation: raw frame must be Project/Alias over one file relation")
    val roots = ts.get._1
    val rollupRel = spark.read.parquet(rollupPath).queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation => lr
    }.getOrElse(throw new IllegalStateException(
      s"RollupNavigation: $rollupPath did not analyze to a file relation"))
    regs.put(roots.toSeq.sorted.mkString(","), Registration(
      roots, ts.get._2, ds.map { case (d, t) => d -> t.get._2 }.toMap,
      ms.get._2, rollupRel, hourCol, sumCol, signature(spark, roots)))
  }

  /** Drop all registrations (spec hygiene). */
  def clear(): Unit = regs.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (regs.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate => tryNavigate(agg).getOrElse(agg)
    }
  }

  private sealed trait GKind
  private final case class TsG(level: String, tz: Option[String]) extends GKind
  private final case class DimG(name: String) extends GKind

  private def tryNavigate(agg: Aggregate): Option[LogicalPlan] = {
    val spark = SparkSession.active
    // classify each grouping expression against each registration on its
    // TRACED form (the main optimizer pulls grouping expressions into a
    // Project below the Aggregate, so the raw grouping list is plain
    // attributes); all-or-nothing
    regs.values.view.flatMap { reg =>
      def traced(e: Expression): Option[Expression] =
        trace(agg.child, e).collect { case (roots, t) if roots == reg.rootPaths => t }
      def classify(e: Expression): Option[GKind] = traced(e).flatMap {
        case t if reg.dimsTraced.exists(_._2 == t) =>
          Some(DimG(reg.dimsTraced.collectFirst { case (d, dt) if dt == t => d }.get))
        case TruncTimestamp(Literal(l: UTF8String, StringType), inner, tz)
            if CoarserLevels.contains(l.toString.toLowerCase) &&
              inner == reg.tsTraced =>
          Some(TsG(l.toString, tz))
        case _ => None
      }
      def isMeasure(e: Expression) = traced(e).exists(_ == reg.measureTraced)

      val classified = agg.groupingExpressions.map(classify)
      val tsGroups = classified.count(_.exists(_.isInstanceOf[TsG]))
      def groupIndexOf(e: Expression): Int =
        agg.groupingExpressions.indexWhere(_.semanticEquals(e))
      // a non-aggregate output may be ANY function of the grouping
      // expressions (the optimizer emits e.g. date_trunc(day, <hour
      // grouping>) directly in the aggregate list) — but nothing else
      // may leak through
      def groundedInGroups(e: Expression): Boolean =
        if (groupIndexOf(e) >= 0) true
        else e match {
          case _: AttributeReference => false
          case _ => e.children.forall(groundedInGroups)
        }
      // aggregate list: grouping-derived outputs + plain SUM(measure)
      val aggsOk = agg.aggregateExpressions.forall {
        case Alias(AggregateExpression(Sum(m, _), _, false, None, _), _) =>
          isMeasure(m)
        case Alias(child, _) => groundedInGroups(child)
        case a: AttributeReference => groupIndexOf(a) >= 0
        case _ => false
      }
      val hasSum = agg.aggregateExpressions.exists {
        case Alias(AggregateExpression(_: Sum, _, _, _, _), _) => true
        case _ => false
      }
      if (classified.forall(_.nonEmpty) && tsGroups == 1 && aggsOk && hasSum &&
          signature(spark, reg.rootPaths) == reg.rawSignature) {
        // fresh output ids for the navigated relation (it may appear
        // several times in one tree)
        val rel = reg.rollupRelation.newInstance()
        def rollAttr(n: String) = rel.output.find(_.name == n).get
        val hourAttr = rollAttr(reg.hourCol)
        val sumAttr = rollAttr(reg.sumCol)
        val newGe = classified.map(_.get).map {
          case TsG(level, tz) =>
            TruncTimestamp(Literal(UTF8String.fromString(level), StringType),
              hourAttr, tz)
          case DimG(d) => rollAttr(d): Expression
        }
        // top-most subtrees matching a grouping expression re-point at
        // the substituted grouping; anything above them is recomputed
        // over the rollup columns unchanged
        def substGroupRefs(e: Expression): Expression = {
          val i = groupIndexOf(e)
          if (i >= 0) newGe(i)
          else e.withNewChildren(e.children.map(substGroupRefs))
        }
        val newAe = agg.aggregateExpressions.map {
          case al @ Alias(ae @ AggregateExpression(s: Sum, _, false, None, _), name) =>
            Alias(ae.copy(aggregateFunction =
              s.withNewChildren(Seq(sumAttr)).asInstanceOf[Sum]), name)(
              exprId = al.exprId, qualifier = al.qualifier)
          case al @ Alias(child, name) =>
            Alias(substGroupRefs(child), name)(
              exprId = al.exprId, qualifier = al.qualifier)
          case a: AttributeReference =>
            Alias(newGe(groupIndexOf(a)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
        }
        Some(Aggregate(newGe, newAe, rel))
      } else None
    }.headOption
  }
}
