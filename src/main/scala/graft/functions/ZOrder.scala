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
      targetFiles: Int, buckets: Int): org.apache.spark.sql.DataFrame = {
    require(zorderCols.nonEmpty, "at least one z-order column")
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0, "buckets must be a power of two")
    val bitsPer = java.lang.Integer.numberOfTrailingZeros(buckets)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val casted = df.select(zorderCols.map(c => numericView(df, c).as(c)).toIndexedSeq: _*)
    // one pass for all columns (the Array overload), not one scan per column
    val bounds = casted.stat.approxQuantile(zorderCols.toArray, probs, 0.001).toSeq
    zorderCols.zip(bounds).foreach { case (c, b) =>
      if (b.isEmpty)
        throw graft.catalog.UnsupportedOperationError(
          s"ZORDER BY column '$c' has no non-null values to cluster on")
    }
    val z = zValue(zorderCols.zip(bounds).map { case (c, b) => (numericView(df, c), b) }, bitsPer)
    df.withColumn("__graft_z", z)
      .repartitionByRange(math.max(1, targetFiles), col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }
}
