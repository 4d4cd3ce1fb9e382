package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV / theta sketch of a column's distinct values (Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations", SIGMOD'07 — the same estimator family as Apache
  * DataSketches' theta sketch): keep the k SMALLEST 64-bit hashes of
  * the distinct values seen. Two properties make it the cross-corpus
  * overlap primitive HLL cannot be:
  *
  *   - the sketch is a uniform SAMPLE of the distinct values (the
  *     hashes below the k-th order statistic), so it supports SET
  *     ALGEBRA: with θ = min(θ_A, θ_B), the estimate of any derived
  *     set S over the retained hashes is |{h ∈ S : h < θ}| / θ —
  *     intersection, difference, and Jaccard fall out, where HLL only
  *     merges to a union;
  *   - partials MERGE exactly (union the hash sets, re-truncate to k),
  *     so it runs as one map-side-combined aggregate: at 100 TB,
  *     estimating |docs(source=A) ∩ docs(source=B)| costs one scan and
  *     k longs per partial — no join, no shuffle of distinct keys.
  *
  * Relative error is ~1/sqrt(k-2) per estimate (k=1024 → ~3%); the
  * intersection error grows as the overlap shrinks relative to the
  * union (standard theta-sketch caveat, documented at the call sites).
  *
  * Hashing: XXH64 of the value's UTF-8 string rendering with a fixed
  * seed — deterministic across runs/partitionings, consistent with the
  * engine's other sketches (BloomHash, MinHashSigExpr). Unsigned hash
  * order is materialized by storing h XOR Long.MinValue ("shifted"
  * form) so signed comparisons give unsigned order; the OUTPUT array
  * is in shifted form too (ascending = smallest unsigned hashes
  * first), which the combinator expressions rely on for the θ cut.
  */
object KmvHash {
  // fixed seed — part of the sketch's value identity; never change
  private val Seed = 0x27d4eb2f165667c5L

  /** Shifted hash: unsigned order of XXH64 == signed order of this. */
  def shifted(bytes: Array[Byte]): Long =
    XxHash64.hash(bytes, Seed) ^ Long.MinValue

  /** Normalized position of a shifted hash in [0, 1). */
  def norm(shifted: Long): Double =
    (shifted.toDouble - Long.MinValue.toDouble) / 18446744073709551616.0 // 2^64
}

/** k smallest shifted hashes of the distinct values seen, as a sorted
  * set. java.util.TreeSet keeps insert/evict O(log k) with k bounded
  * (hundreds to a few thousand), so the update path is cache-resident.
  */
final class KmvBuffer(val k: Int) {
  val hashes = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit = {
    if (hashes.size < k) { hashes.add(h); () }
    else if (h < hashes.last()) {
      if (hashes.add(h)) { hashes.remove(hashes.last()); () }
    }
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.hashes.iterator()
    while (it.hasNext) insert(it.next())
  }
}

/** Aggregate: `kmv_sketch(value, k)` → array<long> of the k smallest
  * shifted hashes, ascending. Fewer than k entries means the sketch
  * saw fewer than k distinct values — estimates are then EXACT.
  */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 16, s"kmv_sketch: k must be >= 16, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null)
      buf.insert(KmvHash.shifted(v.asInstanceOf[UTF8String].getBytes))
    buf
  }

  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Any](buf.hashes.size)
    val it = buf.hashes.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.hashes.size * 8)
    bb.putInt(buf.k).putInt(buf.hashes.size)
    val it = buf.hashes.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.hashes.add(bb.getLong()); i += 1 }
    buf
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch: child must be STRING (cast first), got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

/** Shared estimate math over sorted shifted-hash arrays. θ is the
  * normalized k-th smallest hash when the sketch is FULL (size == k),
  * else 1.0 (the sketch holds every distinct value — exact regime).
  */
object KmvEstimate {
  def theta(sorted: Array[Long], k: Int): Double =
    if (sorted.length < k) 1.0 else KmvHash.norm(sorted(sorted.length - 1))

  /** |{h ∈ sorted : norm(h) < cut}| via binary search (array ascending). */
  def countBelow(sorted: Array[Long], cut: Double): Int = {
    if (cut >= 1.0) return sorted.length
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (KmvHash.norm(sorted(mid)) < cut) lo = mid + 1 else hi = mid
    }
    lo
  }

  def cardinality(sorted: Array[Long], k: Int): Double = {
    if (sorted.length < k) sorted.length.toDouble
    else (k - 1).toDouble / theta(sorted, k)
  }

  /** (intersection, union, jaccard) under the common θ cut. */
  def setOps(a: Array[Long], b: Array[Long], k: Int): (Double, Double, Double) = {
    val cut = math.min(theta(a, k), theta(b, k))
    val na = countBelow(a, cut)
    val nb = countBelow(b, cut)
    // sorted-merge intersection count below the cut
    var i = 0; var j = 0; var both = 0
    while (i < na && j < nb) {
      if (a(i) == b(j)) { both += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = na + nb - both
    val inter = if (cut >= 1.0) both.toDouble else both.toDouble / cut
    val uni = if (cut >= 1.0) union.toDouble else union.toDouble / cut
    val jac = if (union == 0) 0.0 else both.toDouble / union.toDouble
    (inter, uni, jac)
  }

  private[functions] def toArray(ad: ArrayData): Array[Long] = ad.toLongArray()
}

/** `kmv_cardinality(sketch, k)` → double distinct-count estimate. */
case class KmvCardinality(child: Expression, k: Int)
    extends Expression with UnaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else KmvEstimate.cardinality(KmvEstimate.toArray(v.asInstanceOf[ArrayData]), k)
  }
  override protected def withNewChildInternal(newChild: Expression): KmvCardinality =
    copy(child = newChild)
  override def prettyName: String = "kmv_cardinality"
}

/** `kmv_set_ops(a, b, k)` → struct<intersection, union, jaccard>
  * (doubles) under the common θ cut. Runs once per pair of group
  * sketches — metadata scale, interpreted eval is the right cost.
  */
case class KmvSetOps(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("intersection", DoubleType, nullable = false),
    StructField("union", DoubleType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (inter, uni, jac) = KmvEstimate.setOps(
      KmvEstimate.toArray(a.asInstanceOf[ArrayData]),
      KmvEstimate.toArray(b.asInstanceOf[ArrayData]), k)
    InternalRow(inter, uni, jac)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSetOps =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kmv_set_ops"
}

/** `kmv_merge(a, b, k)` → the merged sketch (k smallest distinct shifted
  * hashes of the union, ascending). This is what makes KMV state
  * INCREMENTALLY MAINTAINABLE: a materialized view can keep one sketch
  * per group and fold each append batch's sketch in with a sorted
  * merge — the distinct-count estimate stays as if built from scratch.
  * NULL is the empty sketch (a group's first batch).
  */
case class KmvMerge(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null && r == null) return new GenericArrayData(Array.empty[Any])
    if (l == null) return r
    if (r == null) return l
    val a = KmvEstimate.toArray(l.asInstanceOf[ArrayData])
    val b = KmvEstimate.toArray(r.asInstanceOf[ArrayData])
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    new GenericArrayData(
      (if (n == out.length) out else java.util.Arrays.copyOf(out, n))
        .map(identity[Any]))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    throw new IllegalStateException("unreachable: eval overridden")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvMerge =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kmv_merge"
}

object KmvFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  /** KMV sketch of `value`'s distinct set, k smallest hashes. */
  def kmvSketch(value: Column, k: Int): Column =
    toCol(KmvSketchAgg(toExpr(value), k).toAggregateExpression())

  /** Distinct-count estimate from a sketch built with the same k. */
  def kmvCardinality(sketch: Column, k: Int): Column =
    toCol(KmvCardinality(toExpr(sketch), k))

  /** struct<intersection, union, jaccard> estimates for two sketches
    * built with the same k.
    */
  def kmvSetOps(a: Column, b: Column, k: Int): Column =
    toCol(KmvSetOps(toExpr(a), toExpr(b), k))

  /** Merged sketch of two sketches built with the same k (NULL = empty). */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    toCol(KmvMerge(toExpr(a), toExpr(b), k))

  /** Register SQL-callable forms — `kmv_merge(a, b, k)` and
    * `kmv_cardinality(sketch, k)` — so sketch state folds inside SQL
    * expressions (IncrementalView's MERGE SET clauses, ad-hoc reads).
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def intLit(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    reg.createOrReplaceTempFunction("kmv_merge",
      exprs => KmvMerge(exprs.head, exprs(1), intLit(exprs(2))), "scala_udf")
    reg.createOrReplaceTempFunction("kmv_cardinality",
      exprs => KmvCardinality(exprs.head, intLit(exprs(1))), "scala_udf")
  }
}
