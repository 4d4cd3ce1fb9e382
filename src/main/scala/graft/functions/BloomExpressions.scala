package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Classic Bloom filter over a column's values, built as a mergeable
  * aggregate — the per-file index behind BloomIndex's file skipping
  * (Delta's "bloom filter index" feature shape: one filter per data
  * file per indexed column; a point lookup consults the filters and
  * reads only the files that MIGHT contain the key).
  *
  * Hashing: the value's UTF-8 string rendering through the
  * self-contained XXH64 (two fixed seeds), k probe positions by
  * Kirsch–Mitzenmacher double hashing h1 + i*h2. Hashing the STRING
  * rendering (the build pipeline casts the column to string first)
  * keeps build and probe trivially consistent across engines and
  * restarts — no dependence on internal binary layouts.
  *
  * False positives only, never false negatives: a probe answering
  * "absent" is a PROOF the key is not in the file, so pruning on it is
  * always safe; a stale or missing filter only costs an extra file
  * read. That one-sided contract is what lets the sidecar index be
  * refreshed lazily (nightly, per-batch) instead of transactionally.
  */
object BloomHash {
  // arbitrary fixed seeds (golden-ratio / xxh64 avalanche constants);
  // part of the on-disk index format — never change them
  private val Seed1 = 0x9e3779b97f4a7c15L
  private val Seed2 = 0xc2b2ae3d27d4eb4fL

  /** (h1, h2) for a value's UTF-8 bytes; h2 forced odd so the k probe
    * positions cycle through the whole bit space even when m is even.
    */
  def hashPair(bytes: Array[Byte]): (Long, Long) = {
    val h1 = XxHash64.hash(bytes, Seed1)
    val h2 = XxHash64.hash(bytes, Seed2) | 1L
    (h1, h2)
  }

  def setBits(bits: Array[Long], numBits: Int, k: Int, h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits.toLong).toInt
      bits(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Byte], k: Int, h1: Long, h2: Long): Boolean = {
    val numBits = bits.length.toLong * 8L
    if (numBits == 0L) return true // degenerate filter: no proof of absence
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Optimal classic-Bloom sizing for n items at false-positive rate p,
    * capped at maxBits (the fpp degrades gracefully past the cap —
    * still never a false negative).
    */
  def sizing(n: Long, fpp: Double, maxBits: Int): (Int, Int) = {
    require(fpp > 0 && fpp < 1, s"bloom: fpp must be in (0,1), got $fpp")
    val nn = math.max(1L, n)
    val ln2 = math.log(2)
    val mRaw = math.ceil(-nn * math.log(fpp) / (ln2 * ln2))
    val m0 = math.min(mRaw, maxBits.toDouble).toLong
    val m = (((m0 + 63) / 64) * 64).toInt.max(64) // whole longs
    val k = math.max(1, math.round(m.toDouble / nn * ln2).toInt).min(16)
    (m, k)
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](bits.length * 8)
    var i = 0
    while (i < bits.length) {
      var j = 0
      while (j < 8) { out(i * 8 + j) = ((bits(i) >>> (8 * j)) & 0xff).toByte; j += 1 }
      i += 1
    }
    out
  }
}

final class BloomBuffer(val numBits: Int, val k: Int) {
  val bits = new Array[Long](numBits / 64)
}

/** Aggregate: Bloom filter (BINARY, little-endian bit array) of the
  * string child's values. numBits/k are fixed per build (BloomIndex
  * sizes them from the batch's per-file row counts); partials OR
  * together, so the build is one shuffle-light hash aggregate.
  */
case class BloomAgg(child: Expression, numBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBuffer] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0, "bloom_agg: numBits must be a positive multiple of 64")
  require(k > 0, "bloom_agg: k must be positive")
  // post-resolution type gate (the child is unresolved at construction)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_agg: child must be STRING (cast first), got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(numBits, k)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) = BloomHash.hashPair(v.asInstanceOf[UTF8String].getBytes)
      BloomHash.setBits(buf.bits, numBits, k, h1, h2)
    }
    buf
  }

  override def merge(b1: BloomBuffer, b2: BloomBuffer): BloomBuffer = {
    var i = 0
    while (i < b1.bits.length) { b1.bits(i) |= b2.bits(i); i += 1 }
    b1
  }

  override def eval(buf: BloomBuffer): Any = BloomHash.toBytes(buf.bits)

  override def serialize(buf: BloomBuffer): Array[Byte] = BloomHash.toBytes(buf.bits)

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val buf = new BloomBuffer(bytes.length * 8, k)
    var i = 0
    while (i < buf.bits.length) {
      var acc = 0L
      var j = 0
      while (j < 8) { acc |= (bytes(i * 8 + j) & 0xffL) << (8 * j); j += 1 }
      buf.bits(i) = acc
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_might_contain(bits, k, h1s, h2s)`: true iff ANY (h1,h2) probe
  * pair is fully present in the filter. `k` rides the sidecar row (each
  * refresh batch sizes its own filters). Runs once per (file, column)
  * sidecar row during scan planning — metadata scale, so an
  * interpreted eval is the right cost/complexity point (the hot path
  * this expression EXISTS to protect is the data scan it prunes).
  */
case class BloomMightContain(bits: Expression, kCol: Expression, hashes: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(bits, kCol, hashes)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val b = bits.eval(input)
    val kv = kCol.eval(input)
    if (b == null || kv == null) return true // unreadable filter: no proof, keep the file
    val k = kv.asInstanceOf[Int]
    val arr = hashes.eval(input).asInstanceOf[ArrayData]
    val bytes = b.asInstanceOf[Array[Byte]]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val row = arr.getStruct(i, 2)
      if (BloomHash.mightContain(bytes, k, row.getLong(0), row.getLong(1))) return true
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomMightContain =
    copy(bits = newChildren(0), kCol = newChildren(1), hashes = newChildren(2))
  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  def bloomAgg(value: Column, numBits: Int, k: Int): Column =
    toCol(BloomAgg(toExpr(value), numBits, k).toAggregateExpression())

  /** Probe column: `hashes` is a literal array<struct<h1,h2>> of the
    * lookup keys' hash pairs (computed once on the driver from the
    * predicate's literals).
    */
  def bloomMightContain(bits: Column, k: Column, hashes: Column): Column =
    toCol(BloomMightContain(toExpr(bits), toExpr(k), toExpr(hashes)))
}
