package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving frequent-items sketch (Metwally/Agrawal/El Abbadi,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams") with `k` counters, as a MERGEABLE typed-imperative
  * aggregate — the "top domains / top tokens without a full groupBy"
  * primitive: a full word count over 100 TB shuffles every distinct
  * token; this sketch keeps k counters per partition, merges them on
  * the driver-bound combine path, and reports every heavy hitter with
  * deterministic error BOUNDS.
  *
  * Guarantees (they survive the distributed merge):
  *   - every reported item carries (est, err) with
  *     `est - err <= true count <= est`;
  *   - any item whose true count exceeds the sketch's eviction floor —
  *     at most total/k per partial, summed across merges — is present,
  *     so genuinely heavy items can never be missed.
  *
  * Merge (mergeable-summaries formulation): an item untracked by the
  * other side contributes that side's eviction FLOOR (an upper bound on
  * anything it evicted) to both est and err; the union then truncates
  * back to the k largest, which keeps the floor invariant — every
  * dropped item's est is <= the kept minimum.
  *
  * The per-eviction min scan is O(k); k is sketch-sized (hundreds), so
  * the update path stays cache-resident. Result: array<struct<item,
  * est, err>> sorted by est desc, item asc.
  */
final class SpaceSavingBuffer(val k: Int) {
  val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  // upper bound on the true count of anything this sketch has evicted
  var floor: Long = 0L

  def update(item: String): Unit = counters.get(item) match {
    case Some((est, err)) => counters.update(item, (est + 1L, err))
    case None if counters.size < k => counters.update(item, (floor + 1L, floor))
    case None =>
      val (minItem, (minEst, _)) = counters.minBy { case (i, (e, _)) => (e, i) }
      counters.remove(minItem)
      // after a merge-truncation the floor can exceed the min counter;
      // the new item's upper bound must cover BOTH (it may have been
      // evicted before at up to floor, or be taking minItem's slot)
      val base = math.max(floor, minEst)
      floor = base
      counters.update(item, (base + 1L, base))
  }

  def mergeIn(other: SpaceSavingBuffer): Unit = {
    val mine = counters.toMap
    val theirs = other.counters
    val items = mine.keySet ++ theirs.keySet
    counters.clear()
    items.foreach { i =>
      val (ea, ra) = mine.getOrElse(i, (floor, floor))
      val (eb, rb) = theirs.getOrElse(i, (other.floor, other.floor))
      counters.update(i, (ea + eb, ra + rb))
    }
    floor += other.floor
    if (counters.size > k) {
      val kept = counters.toSeq.sortBy { case (i, (e, _)) => (-e, i) }.take(k)
      val dropMax = counters.valuesIterator.map(_._1).toSeq.sorted.apply(counters.size - k - 1)
      counters.clear()
      kept.foreach { case (i, v) => counters.update(i, v) }
      floor = math.max(floor, dropMax)
    }
  }
}

case class SpaceSavingAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  require(k > 0, "space_saving: k must be positive")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer(k)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: SpaceSavingBuffer, b2: SpaceSavingBuffer): SpaceSavingBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val rows = buf.counters.toSeq
      .sortBy { case (i, (e, _)) => (-e, i) }
      .map { case (i, (e, r)) =>
        InternalRow(UTF8String.fromString(i), e, r): Any
      }
    new GenericArrayData(rows.toArray)
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.floor)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (i, (e, r)) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(e); out.writeLong(r)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    buf.floor = in.readLong()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val item = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      val e = in.readLong(); val r = in.readLong()
      buf.counters.update(item, (e, r))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
  override def prettyName: String = "space_saving_topk"
}

object FrequentItemsFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  /** SpaceSaving sketch of `item` with k counters:
    * array<struct<item, est, err>> sorted by est desc, with
    * `est - err <= true <= est` per entry.
    */
  def spaceSavingTopK(item: Column, k: Int): Column =
    toCol(SpaceSavingAgg(toExpr(item), k).toAggregateExpression())
}
