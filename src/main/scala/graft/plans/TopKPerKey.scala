package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
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

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val emitRank = rankAttr
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
      emitRank match {
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
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
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
