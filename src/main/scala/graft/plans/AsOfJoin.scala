package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A whole-operator Catalyst extension: sort-merge **as-of join**
  * (SURVEY.md §2.3 "as-of flavor"; preference ladder §7.3/(c) —
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`).
  *
  * Semantics: for each left row, the single right row with the same
  * key whose time is the latest at-or-before the left row's time
  * (ties broken by the trailing `rightTieBreak` ordering, last wins —
  * i.e. the maximal (time, tieBreak…) tuple). Left rows with no match
  * are dropped (inner as-of).
  *
  * Why a physical operator: the compositional form
  * ([[graft.operators.Relational.asOfLatest]] — equi-join on the key,
  * θ-filter on time, `row_number` window, `rank=1` filter) materializes
  * every (left × earlier-right) pair before the window discards all but
  * one per left row. Fan-out is bounded by per-key right-history
  * length — fine for shallow histories, quadratic for deep ones. This
  * operator declares `ClusteredDistribution` on the keys and per-
  * partition `(key, time)` ordering, so EnsureRequirements plans
  * exactly the exchanges+sorts a sort-merge join needs, and the merge
  * itself is one O(|L|+|R|) pass per co-partition holding ONE buffered
  * right row — no pair materialization, no window state.
  *
  * Scale posture: both sides shuffle once on the key (same as the
  * compositional form) but nothing re-sorts the joined pairs and no
  * window buffers per-key groups; skew in left keys costs only scan
  * time. The operator composes with AQE (exchanges are ordinary shuffle
  * exchanges).
  *
  * All column references are plain attributes of the children
  * (callers materialize derived time columns with `withColumn` first),
  * so the node is born resolved and no analyzer rule is needed.
  */
final case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                              leftKey: Attribute, rightKey: Attribute,
                              leftTime: Attribute, rightTime: Attribute,
                              rightTieBreak: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinNode =
    copy(left = l, right = r)
}

/** Optimizer rule: push left-side filters through [[AsOfJoinNode]].
  *
  * Catalyst's own `PushDownPredicates` does not know custom logical
  * nodes, so a `Filter` above the as-of join would otherwise run after
  * the (expensive) merge and block parquet pushdown entirely. Each left
  * row matches independently of every other left row, so any
  * deterministic conjunct referencing only left-side attributes commutes
  * with the join — it lands directly above the left relation, where
  * normal planning carries it into the scan (`PushedFilters`).
  *
  * Right-side conjuncts must NOT be pushed: they filter the RESULT's
  * matched row, not the candidate history — pre-filtering the right side
  * would change which row is "latest at-or-before" (e.g. `o_orderkey
  * != 5` above the join removes results that matched order 5; pushed
  * down it would instead match those events to the next-older order).
  */
object AsOfFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val moved = plan.transform {
      case f @ Filter(cond, j: AsOfJoinNode) =>
        val (pushable, kept) = splitConjunctivePredicates(cond).partition(c =>
          c.deterministic && c.references.subsetOf(j.left.outputSet))
        if (pushable.isEmpty) f
        else {
          val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
          kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
    // This batch runs AFTER the optimizer's own PushDownPredicates
    // fixpoint, so a filter we relocate below the join would stall
    // above any Project between the join and the scan (e.g. the
    // reader's ts normalization) and never reach PushedFilters. Re-run
    // the stock rule on the changed plan so relocated conjuncts keep
    // sinking; the rest of the plan is already at its fixpoint.
    if (moved.fastEquals(plan)) plan
    else org.apache.spark.sql.catalyst.optimizer.PushDownPredicates(moved)
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                              leftKey: Attribute, rightKey: Attribute,
                              leftTime: Attribute, rightTime: Attribute,
                              rightTieBreak: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // co-partition both sides on the key; EnsureRequirements makes the
  // two ClusteredDistributions compatible (same hash, same partition
  // count), exactly as for SortMergeJoin
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // per-partition merge order: (key, time) left, (key, time, ties…) right
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKey = BindReferences.bindReference(leftKey.asInstanceOf[Expression], left.output)
    val lTime = BindReferences.bindReference(leftTime.asInstanceOf[Expression], left.output)
    val rKey = BindReferences.bindReference(rightKey.asInstanceOf[Expression], right.output)
    val rTime = BindReferences.bindReference(rightTime.asInstanceOf[Expression], right.output)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      new Iterator[InternalRow] {
        private var rHead: InternalRow = _      // un-consumed right row
        private var candidate: InternalRow = _  // best right row for candKey so far
        private var candKey: Any = _
        private var out: InternalRow = _

        private def advance(): Unit = {
          out = null
          while (out == null && lIter.hasNext) {
            val lRow = lIter.next()
            val k = lKey.eval(lRow)
            val t = lTime.eval(lRow)
            if (k != null && t != null) {
              // consume right rows that are ≤ (k, t); remember the last
              // same-key one (right side is (key, time, ties)-sorted, so
              // "last consumed" = maximal (time, ties…) at-or-before t)
              var scan = true
              while (scan) {
                if (rHead == null && rIter.hasNext) rHead = rIter.next()
                if (rHead == null) scan = false
                else {
                  val rk = rKey.eval(rHead)
                  val rt = rTime.eval(rHead)
                  if (rk == null || rt == null) rHead = null // unmatched by definition
                  else {
                    val c = keyOrd.compare(rk, k)
                    if (c < 0) rHead = null // no current/future left key equals rk
                    else if (c == 0 && timeOrd.compare(rt, t) <= 0) {
                      candidate = rHead.copy(); candKey = rk; rHead = null
                    } else scan = false // right is ahead of this left row
                  }
                }
              }
              if (candidate != null && keyOrd.compare(candKey, k) == 0) {
                // copy: this iterator looks one row ahead (hasNext), so
                // the projection buffer would be overwritten before the
                // consumer reads the row it was handed
                out = project(joined(lRow, candidate)).copy()
              }
            }
          }
        }

        advance()
        override def hasNext: Boolean = out != null
        override def next(): InternalRow = {
          val r = out; advance(); r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** Session-extension registration route (`spark.sql.extensions=
  * graft.plans.GraftExtensions` on spark-submit, or
  * `.withExtensions(new GraftExtensions)` at build time): the whole
  * library surface — the as-of planner strategy plus every native
  * function ([[graft.functions.NativeFns.builders]]) — on sessions this
  * library does not construct, no [[AsOf.register]] /
  * `NativeFns.register` calls needed. */
final class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => AsOfFilterPushdown)
    graft.functions.NativeFns.builders.foreach { case (name, b) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        b))
    }
  }
}

/** Public API + strategy registration for the as-of join operator. */
object AsOf {

  /** Idempotently add the planner strategy to a session (the
    * `SparkSessionExtensions` route needs the strategy at session build
    * time; `experimental.extraStrategies` attaches to a live session). */
  def register(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
    if (!em.extraOptimizations.contains(AsOfFilterPushdown))
      em.extraOptimizations = em.extraOptimizations :+ AsOfFilterPushdown
  }

  /** As-of join `left` to the latest `right` row at-or-before the left
    * time, per key. All referenced columns must already exist on the
    * inputs (materialize derived time columns with `withColumn` first);
    * `tieBreak` columns (right side) resolve equal-time ties, larger
    * value wins. Output columns: left's then right's.
    */
  def latest(left: DataFrame, right: DataFrame,
             leftKey: String, rightKey: String,
             leftTime: String, rightTime: String,
             tieBreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asOf: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "asOf: left and right must not share attribute ids (alias one side)")
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      tieBreak.map(attr(rPlan, _)))
    org.apache.spark.sql.GraftSqlShim.ofRows(spark, node)
  }
}
