package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable quantile sketch as a BINARY-valued aggregate — the stamp
  * behind ColumnStats' scan-free `APPROX_PERCENTILE` ([[ColumnStats]]
  * stores it per numeric column; appends fold by MERGE).
  *
  * The sketch itself is Spark's own Greenwald-Khanna summary
  * (`catalyst.util.QuantileSummaries` via `ApproximatePercentile`'s
  * `PercentileDigest` + serializer): deterministic (no randomized
  * compaction), mergeable with the same per-merge error posture as
  * Spark's OWN distributed approx_percentile (a partial-aggregate tree
  * is exactly a sequence of compress+merge steps), and rank-error
  * bounded by `relativeError`. Space grows O((1/ε)·log(εn)) — bounded
  * by ColumnStats' size cap, which unsets the stamp rather than let a
  * table property balloon (self-limiting, stale-never-wrong).
  */
case class QuantileDigestAgg(child: Expression, relativeError: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ApproximatePercentile.PercentileDigest]
    with UnaryLike[Expression] {

  require(relativeError > 0 && relativeError < 1,
    s"quantile_digest: relativeError must be in (0, 1), got $relativeError")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ApproximatePercentile.PercentileDigest =
    new ApproximatePercentile.PercentileDigest(relativeError)

  override def update(buf: ApproximatePercentile.PercentileDigest,
      input: InternalRow): ApproximatePercentile.PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: ApproximatePercentile.PercentileDigest,
      b2: ApproximatePercentile.PercentileDigest)
      : ApproximatePercentile.PercentileDigest = {
    b1.merge(b2); b1
  }

  override def eval(buf: ApproximatePercentile.PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buf)

  override def serialize(buf: ApproximatePercentile.PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buf)

  override def deserialize(bytes: Array[Byte]): ApproximatePercentile.PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"quantile_digest: child must be DOUBLE (cast first), got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileDigestAgg =
    copy(child = newChild)
  override def prettyName: String = "quantile_digest"
}

/** Driver-side codec + query/merge helpers over the serialized digest
  * (metadata-sized property bytes — no executor involved). */
object QuantileDigest {
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  def sketch(value: Column, relativeError: Double): Column =
    toCol(QuantileDigestAgg(toExpr(value), relativeError).toAggregateExpression())

  def encode(bytes: Array[Byte]): String =
    "b" + java.util.Base64.getEncoder.encodeToString(bytes)

  def decode(s: String): ApproximatePercentile.PercentileDigest =
    ApproximatePercentile.serializer.deserialize(
      java.util.Base64.getDecoder.decode(s.stripPrefix("b")))

  /** Exact same merge step Spark's own partial-aggregate path runs. */
  def mergeEncoded(a: String, b: String): String = {
    val da = decode(a)
    da.merge(decode(b))
    encode(ApproximatePercentile.serializer.serialize(da))
  }

  /** Row count the digest has absorbed (0 = empty column: SQL NULL). */
  def count(d: ApproximatePercentile.PercentileDigest): Long =
    d.quantileSummaries.count

  /** Percentile values at `percentages` (digest must be non-empty). */
  def percentiles(d: ApproximatePercentile.PercentileDigest,
      percentages: Array[Double]): Array[Double] =
    d.getPercentiles(percentages).toArray
}
