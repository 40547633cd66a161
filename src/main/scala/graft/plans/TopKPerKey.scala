package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, GenericInternalRow, JoinedRow, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.IntegerType

/** Whole-operator top-k-per-key: the `row_number() OVER (PARTITION BY k
  * ORDER BY o) <= k` pattern as a first-class physical operator.
  *
  * Why not the window: `WindowExec` must shuffle EVERY row of a group to
  * one partition and fully sort it, only to discard all but k rows — at
  * 100 TB that is a full-data shuffle plus an O(n log n) sort dominated by
  * rows that can never rank. This operator runs per-partition bounded
  * heaps (O(n log k), state capped at `maxPartialKeys` keys with unpruned
  * pass-through beyond — see [[TopKPerKeyExec]]) BEFORE the exchange,
  * shuffles at most k rows per key per input partition (plus pass-through
  * overflow), then streams a sort-based group-limit after — the same
  * partial/final contract as hash aggregation, expressed for ranking.
  * `EnsureRequirements` inserts the key-hash exchange and a spillable sort
  * over the pruned rows between the two phases (and elides the exchange
  * when the child is already clustered on the keys, e.g. bucketed tables).
  *
  * This is the §7.3 custom-LogicalPlan+Strategy+Exec path, registered via
  * [[graft.GraftExtensions]] or imperatively by [[TopKPerKey.perKey]].
  * Determinism contract: callers supply a TOTAL sort order (add unique
  * tiebreakers), making the emitted rows and ranks engine-reproducible —
  * the DuckDB oracle states the same query with a window.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] as partial heaps → (exchange via required
  * distribution) → final heaps + rank emit.
  */
class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, rankAttr, child) =>
      val maxKeys = org.apache.spark.sql.internal.SQLConf.get.getConfString(
        TopKPerKey.maxPartialKeysConf, TopKPerKey.defaultMaxPartialKeys.toString).toInt
      val partial = TopKPerKeyExec(keys, order, k, None, maxKeys, planLater(child))
      TopKPerKeyExec(keys, order, k, Some(rankAttr), maxKeys, partial) :: Nil
    case _ => Nil
  }
}

/** One phase of the top-k operator.
  *
  * `rankAttr == None` → partial: any distribution, bounded per-key heaps
  * that emit ≤ k pruned child rows per key. Heap state is capped at
  * `maxPartialKeys` distinct keys per partition; past the cap, rows for
  * untracked keys PASS THROUGH unpruned (still correct — the final phase
  * computes the exact top-k), the same opportunistic contract as Spark's
  * partial hash aggregation. Memory is therefore bounded regardless of key
  * cardinality.
  *
  * `Some(attr)` → final: requires clustering on keys AND sorting on
  * (keys, order) — Spark inserts a spillable SortExec over the already
  * partial-pruned rows — then a streaming group-limit emits the first k
  * rows of each key group with a 1-based rank in O(1) state.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[AttributeReference],
    maxPartialKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isEmpty) UnspecifiedDistribution :: Nil
    // global top-k (no PARTITION BY): all surviving rows to one partition —
    // ClusteredDistribution(Nil) is rejected by Spark's planner
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (rankAttr.isEmpty) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  // the exchange below us clusters on keys; adding rank doesn't change that
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    if (rankAttr.isEmpty) Nil else keys.map(SortOrder(_, Ascending)) ++ order

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val emitRank = rankAttr
    val maxKeys = maxPartialKeys
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val out: Iterator[InternalRow] = emitRank match {
        case None =>
          // "best" = first under the caller's ORDER BY; the max-heap keeps
          // the worst of the retained k on top for O(log k) replacement
          val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(sortOrder, childOutput)
          val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
          new Iterator[InternalRow] {
            private var passThrough: InternalRow = null
            private var drain: Iterator[InternalRow] = null
            private def advance(): Unit = {
              while (passThrough == null && iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row)
                heaps.get(key) match {
                  case None =>
                    if (heaps.size < maxKeys) {
                      val pq = mutable.PriorityQueue.empty[InternalRow](ord)
                      pq.enqueue(row.copy())
                      heaps.put(key.copy(), pq)
                    } else {
                      // state cap hit: emit unpruned, final phase prunes
                      passThrough = row
                    }
                  case Some(pq) =>
                    if (pq.size < kLocal) pq.enqueue(row.copy())
                    else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
                }
              }
              if (passThrough == null && drain == null) {
                drain = heaps.iterator.flatMap { case (_, pq) => pq.dequeueAll.reverseIterator }
              }
            }
            override def hasNext: Boolean = {
              if (passThrough != null) true
              else { advance(); passThrough != null || drain.hasNext }
            }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException("empty iterator")
              if (passThrough != null) { val r = passThrough; passThrough = null; r }
              else drain.next()
            }
          }
        case Some(attr) =>
          // input is sorted by (keys, order): stream each key group, emit
          // the first k rows with their position as the rank
          val proj = UnsafeProjection.create(childOutput :+ attr, childOutput :+ attr)
          val joined = new JoinedRow
          val rankRow = new GenericInternalRow(1)
          new Iterator[InternalRow] {
            private var curKey: UnsafeRow = null
            private var seen = 0
            private var pending: InternalRow = null
            private def advance(): Unit = {
              while (pending == null && iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row)
                if (curKey == null || key != curKey) { curKey = key.copy(); seen = 0 }
                seen += 1
                if (seen <= kLocal) pending = row
              }
            }
            override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException("empty iterator")
              rankRow.update(0, seen)
              val r = proj(joined(pending, rankRow))
              pending = null
              r
            }
          }
      }
      out.map { r => numOutputRows += 1; r }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Optimizer rule: rewrite the classic
  * `Filter(rnk <= k)` over `Window([row_number() AS rnk], part, order)`
  * pattern into [[TopKPerKeyPlan]], so queries written with the standard
  * window idiom execute as bounded heaps (see [[TopKPerKeyExec]]).
  *
  * Conservative matching: exactly one window expression, and it is
  * row_number() with a non-empty ORDER BY; the filter must carry a
  * `rnk <= lit` / `rnk < lit` / `rnk = 1` conjunct (other conjuncts stay
  * as a residual Filter); an intervening Project must be pure
  * attribute selection. A `WindowGroupLimit` the optimizer already pushed
  * below the window is stripped — the partial heap phase subsumes it.
  *
  * Tie semantics: with a non-total ORDER BY, which tied rows row_number
  * keeps is already execution-dependent in Spark; the heap may keep
  * different (equally valid) tied rows than a sort would. Callers wanting
  * reproducible output give a total order — same contract as the window.
  *
  * Session opt-in: injected by [[graft.GraftExtensions]] (with the
  * strategy); not registered on plain sessions.
  */
object NativeTopKRule extends Rule[LogicalPlan] with PredicateHelper {

  private def rankLimit(e: Expression, rank: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rank.exprId =>
      Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rank.exprId =>
      Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.exprId == rank.exprId =>
      Some(1)
    case _ => None
  }

  private def rowNumberAttr(w: Window): Option[AttributeReference] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) if w.orderSpec.nonEmpty =>
      a.toAttribute match {
        case ar: AttributeReference => Some(ar)
        case _ => None
      }
    case _ => None
  }

  private def tryRewrite(cond: Expression, w: Window,
      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    rowNumberAttr(w).flatMap { rank =>
      val conjuncts = splitConjunctivePredicates(cond)
      val limits = conjuncts.flatMap(c => rankLimit(c, rank))
      if (limits.isEmpty || limits.min <= 0) None
      else {
        val child = w.child match {
          case wgl: WindowGroupLimit => wgl.child // partial heaps subsume it
          case other => other
        }
        val topk = TopKPerKeyPlan(w.partitionSpec, w.orderSpec, limits.min, rank, child)
        val residual = conjuncts.filter(c => rankLimit(c, rank).isEmpty)
        Some(residual.reduceOption(And).map(Filter(_, wrap(topk))).getOrElse(wrap(topk)))
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, w: Window) =>
      tryRewrite(cond, w, identity).getOrElse(f)
    case f @ Filter(cond, p @ Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      tryRewrite(cond, w, rewritten => Project(projList, rewritten)).getOrElse(f)
  }
}

object TopKPerKey {

  /** Cap on distinct keys tracked by one partial-phase partition; past it,
    * rows for new keys are emitted unpruned (exactness is unaffected).
    * Default bounds partial state to ~maxPartialKeys·k rows.
    */
  val maxPartialKeysConf = "spark.graft.topk.maxPartialKeys"
  val defaultMaxPartialKeys: Int = 1 << 20

  /** Top `k` rows per `keys` group under `order` (give a TOTAL order for
    * deterministic results), with a 1-based `rankName` column appended —
    * drop-in for the filtered-row_number window, planned as bounded heaps.
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      rankName: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    PlanBridge.ensureStrategy(spark, new TopKPerKeyStrategy)
    val keyExprs = keys.map(c => PlanBridge.expression(spark, c))
    val sortOrder = order.map(c => PlanBridge.expression(spark, c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending, Seq.empty)
    })
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    PlanBridge.ofRows(spark,
      TopKPerKeyPlan(keyExprs, sortOrder, k, rankAttr, df.queryExecution.logical))
  }
}
