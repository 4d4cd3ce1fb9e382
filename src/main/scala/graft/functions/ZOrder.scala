package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering support: per-column rank buckets from
  * precomputed quantile boundaries, interleaved bitwise into one sort
  * key. Clustering a table by that key makes each file a tight range in
  * EVERY participating dimension at once, so min/max manifest pruning
  * works for multi-column predicates — the published OPTIMIZE ZORDER BY
  * idea (Morton 1966; the Delta OSS docs describe the same layout).
  */
object ZOrderKernels {
  /** Bucket of `v` in the sorted `bounds` (first index with v <= bounds(i);
    * bounds.length = buckets - 1). Binary search, called from codegen.
    */
  def bucketOf(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= bounds(mid)) hi = mid else lo = mid + 1
    }
    lo
  }
}

/** numeric (double) → quantile-bucket id via boundary binary search. */
case class BucketizeExpr(child: Expression, bounds: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ZOrderKernels.bucketOf(input.asInstanceOf[Double], bounds)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val bRef = ctx.addReferenceObj("bounds", bounds, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ZOrderKernels.bucketOf($c, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "zorder_bucket"
}

/** Hilbert-curve index: maps d-dimensional quantile-bucket coordinates to
  * the cell's distance along the Hilbert space-filling curve. Unlike the
  * Morton/Z curve, Hilbert has no long diagonal jumps — consecutive index
  * values always differ by one step in exactly one dimension — so files
  * cut from a Hilbert-sorted layout cover tighter per-dimension ranges
  * and multi-column min/max pruning discards more of them (the reason
  * newer clustering engines default to Hilbert over Z). Algorithm:
  * Skilling's AxesToTranspose (AIP Conf. Proc. 707, 2004), published
  * public-domain C, followed by a plain bit interleave of the transposed
  * form.
  */
object HilbertKernels {
  /** Hilbert distance of `coords` (each in [0, 2^bits)); requires
    * coords.length * bits <= 63. `coords` is mutated in place.
    */
  def hilbertPos(coords: Array[Int], bits: Int): Long = {
    val n = coords.length
    // AxesToTranspose: Gray-decode axes into the transposed Hilbert form
    var q = 1 << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((coords(i) & q) != 0) coords(0) ^= p
        else { val t = (coords(0) ^ coords(i)) & p; coords(0) ^= t; coords(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { coords(i) ^= coords(i - 1); i += 1 }
    var t = 0
    q = 1 << (bits - 1)
    while (q > 1) { if ((coords(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { coords(i) ^= t; i += 1 }
    // interleave the transposed words: bit b of coords(i) is index bit
    // (b * n + (n - 1 - i)) — coords(0) carries the most significant bits
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        out = (out << 1) | ((coords(i) >> b) & 1)
        i += 1
      }
      b -= 1
    }
    out
  }
}

/** d-ary Hilbert index over pre-bucketed integer coordinates. Children
  * are the per-dimension bucket ids (IntegerType, null-free — callers
  * coalesce); fully codegen'd via a static kernel call.
  */
case class HilbertIndexExpr(children: Seq[Expression], bits: Int) extends Expression {
  require(children.nonEmpty && bits > 0 && children.size * bits <= 63,
    s"hilbert: ${children.size} dims x $bits bits must fit in 63 bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val coords = new Array[Int](children.size)
    var i = 0
    while (i < coords.length) {
      val v = children(i).eval(input)
      coords(i) = if (v == null) 0 else v.asInstanceOf[Int]
      i += 1
    }
    HilbertKernels.hilbertPos(coords, bits)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? 0 : ${e.value};"
    }.mkString("\n")
    ev.copy(
      code = code"""
        ${evals.map(_.code).reduce(_ + _)}
        int[] $arr = new int[${children.size}];
        $fill
        long ${ev.value} = graft.functions.HilbertKernels.hilbertPos($arr, $bits);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  override def prettyName: String = "hilbert_index"
}

object ZOrderFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  /** Bucket id column; NULLs cluster first (bucket 0). */
  def bucketize(c: Column, bounds: Array[Double]): Column =
    coalesce(toCol(BucketizeExpr(toExpr(c.cast(DoubleType)), bounds)), lit(0))

  /** Z-value from per-dimension (column, boundaries) pairs: the low
    * `bitsPer` bits of each bucket id, bit-interleaved round-robin. Built
    * from plain shift/and/or Column arithmetic — fully codegen'd, no UDF.
    */
  def zValue(dims: Seq[(Column, Array[Double])], bitsPer: Int): Column = {
    require(dims.nonEmpty && bitsPer > 0 && dims.size * bitsPer <= 63)
    val buckets = dims.map { case (c, b) => bucketize(c, b).cast(LongType) }
    val terms = for {
      bit <- 0 until bitsPer
      (bkt, d) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(bkt, bit).bitwiseAND(lit(1L)), bit * dims.size + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Re-cluster `df` on the z-value of `zorderCols` into `targetFiles`
    * range partitions, each sorted by z — the rewrite shared by the
    * native and foreign-Delta OPTIMIZE ZORDER paths. Quantile boundaries
    * come from an approxQuantile sketch (driver cost O(buckets)).
    */
  /** Numeric view of a z-order column. A plain cast('double') would turn
    * date/timestamp/string into NULLs and silently degrade that dimension
    * to a no-op — normalize the temporal types explicitly, refuse the
    * rest.
    */
  private def numericView(df: org.apache.spark.sql.DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case DateType => unix_date(col(c)).cast(DoubleType)
      case TimestampType => unix_micros(col(c)).cast(DoubleType)
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType)).cast(DoubleType)
      case _: NumericType => col(c).cast(DoubleType)
      case other => throw graft.catalog.UnsupportedOperationError(
        s"ZORDER BY supports numeric/date/timestamp columns; '$c' is $other")
    }

  def clusterByZOrder(df: org.apache.spark.sql.DataFrame, zorderCols: Seq[String],
      targetFiles: Int, buckets: Int): org.apache.spark.sql.DataFrame =
    clusterByCurve(df, zorderCols, targetFiles, buckets, hilbert = false)

  /** Hilbert variant of clusterByZOrder — same quantile bucketing, the
    * sort key is the Hilbert distance instead of the Morton interleave.
    */
  def clusterByHilbert(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
      targetFiles: Int, buckets: Int): org.apache.spark.sql.DataFrame =
    clusterByCurve(df, cols, targetFiles, buckets, hilbert = true)

  private def clusterByCurve(df: org.apache.spark.sql.DataFrame, curveCols: Seq[String],
      targetFiles: Int, buckets: Int, hilbert: Boolean): org.apache.spark.sql.DataFrame = {
    require(curveCols.nonEmpty, "at least one clustering column")
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0, "buckets must be a power of two")
    val bitsPer = java.lang.Integer.numberOfTrailingZeros(buckets)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val casted = df.select(curveCols.map(c => numericView(df, c).as(c)).toIndexedSeq: _*)
    // one pass for all columns (the Array overload), not one scan per column
    val bounds = casted.stat.approxQuantile(curveCols.toArray, probs, 0.001).toSeq
    curveCols.zip(bounds).foreach { case (c, b) =>
      if (b.isEmpty)
        throw graft.catalog.UnsupportedOperationError(
          s"clustering column '$c' has no non-null values to cluster on")
    }
    val dims = curveCols.zip(bounds).map { case (c, b) => (numericView(df, c), b) }
    val key =
      if (!hilbert) zValue(dims, bitsPer)
      else toCol(HilbertIndexExpr(
        dims.map { case (c, b) => toExpr(bucketize(c, b)) }, bitsPer))
    df.withColumn("__graft_z", key)
      .repartitionByRange(math.max(1, targetFiles), col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }
}
