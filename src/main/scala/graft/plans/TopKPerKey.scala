package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, GenericInternalRow, JoinedRow, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
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
  * heaps (O(n log k), O(keys·k) memory) BEFORE the exchange, shuffles at
  * most k rows per key per input partition, and re-heaps after — the same
  * partial/final contract as hash aggregation, expressed for ranking.
  * `EnsureRequirements` inserts the key-hash exchange between the two
  * phases (and elides it when the child is already clustered on the keys,
  * e.g. bucketed tables).
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
      val partial = TopKPerKeyExec(keys, order, k, None, planLater(child))
      TopKPerKeyExec(keys, order, k, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** One heap phase. `rankAttr == None` → partial (any distribution, emits
  * pruned child rows); `Some(attr)` → final (requires clustering on keys,
  * emits rows + 1-based rank).
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[AttributeReference],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isDefined) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil

  // the exchange below us clusters on keys; adding rank doesn't change that
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val emitRank = rankAttr
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "best" = first under the caller's ORDER BY; the max-heap keeps the
      // worst of the retained k on top for O(log k) replacement
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val pq = mutable.PriorityQueue.empty[InternalRow](ord)
            pq.enqueue(row.copy())
            heaps.put(key.copy(), pq)
          case Some(pq) =>
            if (pq.size < kLocal) pq.enqueue(row.copy())
            else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
        }
      }
      val out = emitRank match {
        case None =>
          heaps.iterator.flatMap { case (_, pq) => pq.dequeueAll.reverseIterator }
        case Some(attr) =>
          val proj = UnsafeProjection.create(childOutput :+ attr, childOutput :+ attr)
          val joined = new JoinedRow
          val rankRow = new GenericInternalRow(1)
          heaps.iterator.flatMap { case (_, pq) =>
            val best = pq.dequeueAll.reverse // ascending under ORDER BY
            best.iterator.zipWithIndex.map { case (row, i) =>
              rankRow.update(0, i + 1)
              proj(joined(row, rankRow))
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
