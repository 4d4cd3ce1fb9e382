package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.SparkSession

/** Custom whole-operator: top-k rows per key — the build-brief's
  * preference tier (c): a LogicalPlan + SparkStrategy + SparkPlan pair
  * registered through SparkSessionExtensions.
  *
  * Why not window row_number + filter: the window plan sorts EVERY key
  * group in full (O(n log n) per partition plus a full sort within
  * partitions after the shuffle). This operator keeps a bounded heap of k
  * rows per key — O(n log k) — and does it twice: a partial pass before
  * the shuffle (so at most k·keys rows per input partition hit the wire,
  * the map-side-combine of top-k) and a final pass after clustering by
  * key. At 100 TB with small k the shuffle shrinks by orders of
  * magnitude versus shuffling every row into a full sort.
  */
final case class TopKPerKeyNode(
    k: Int,
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Shared bounded-heap pass used by both physical nodes. */
private[plans] object TopKHeap {
  def topKPerPartition(
      iter: Iterator[InternalRow],
      k: Int,
      keyExprs: Seq[Expression],
      ordering: Seq[SortOrder],
      output: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keyExprs, output)
    val rowOrd = GenerateOrdering.generate(BindReferences.bindReferences(ordering, output))
    // max-heap by sort order: the head is the WORST retained row
    val heapOrd: Ordering[InternalRow] = (a, b) => rowOrd.compare(a, b)
    val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.enqueue(row.copy())
      else if (rowOrd.compare(row, heap.head) < 0) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala.flatMap(_.iterator)
  }
}

final case class PartialTopKExec(
    k: Int,
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(it =>
      TopKHeap.topKPerPartition(it, k, keyExprs, ordering, child.output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

final case class FinalTopKExec(
    k: Int,
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(it =>
      TopKHeap.topKPerPartition(it, k, keyExprs, ordering, child.output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}

/** Plans TopKPerKeyNode as partial-topk → (exchange inserted by
  * EnsureRequirements) → final-topk.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, ord, child) =>
      FinalTopKExec(k, keys, ord, PartialTopKExec(k, keys, ord, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. */
object TopK {
  /** Keep the top `k` rows per key, ranked by `orderBy` (column, ascending)
    * pairs. Row order within a key is unspecified — add a cheap window
    * over the (k × #keys)-row result if a rank column is needed.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0 && keys.nonEmpty && orderBy.nonEmpty)
    // ensure the strategy is available on this session even when it was
    // built without GraftSqlExtensions (experimental.extraStrategies is
    // the public live-session hook)
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    val node = TopKPerKeyNode(
      k,
      keys.map(UnresolvedAttribute(_)),
      orderBy.map { case (c, asc) =>
        SortOrder(UnresolvedAttribute(c), if (asc) Ascending else Descending)
      },
      df.queryExecution.logical)
    org.apache.spark.sql.GraftColumnBridge.ofRows(df.sparkSession, node)
  }
}
