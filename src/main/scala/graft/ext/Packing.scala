package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: the standard
  * concat-and-chunk layout (concatenate documents in a fixed global
  * order, slice the token stream into fixed-capacity chunks; each doc is
  * assigned the chunk holding its first token).
  *
  * The primitive is a GLOBAL running total — inherently a sequential
  * dependency, which a naive `Window.orderBy(x)` computes by funneling
  * the whole dataset through ONE task. This implementation is the
  * classic two-phase distributed prefix sum instead: range-partition by
  * the order column, per-partition window cumsum (parallel), collect one
  * total per partition (a #partitions-sized driver list, not data),
  * broadcast the exclusive partition offsets back, and add. Wall-clock
  * scales with 1/#partitions; driver traffic is O(#partitions).
  */
object Packing {

  /** Add `outCol` = running total of `valueCol` over ascending `orderCol`
    * (an integral column with unique values — it defines the global
    * order). Buckets are derived arithmetically from the order column's
    * min/max — NOT repartitionByRange, whose sampled boundaries can
    * differ between the offsets job and the output job and silently
    * misalign the prefix (observed; range sampling is per-execution).
    */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val nParts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val mm = df.agg(min(col(orderCol)).cast("long").as("lo"),
      max(col(orderCol)).cast("long").as("hi")).collect()(0)
    if (mm.isNullAt(0)) return df.withColumn(outCol, lit(null).cast("long"))
    val lo = mm.getLong(0)
    // span/scale in double: (v - lo) * nParts would overflow Long for wide
    // spans (epoch-nano order columns); double conversion is monotone
    // non-decreasing, which is all bucketing needs (exactness is not —
    // any same-value-same-bucket order-preserving map works)
    val span = math.max(1.0, (mm.getLong(1) - lo).toDouble + 1.0)
    val bucket = least(lit(nParts - 1), greatest(lit(0),
      floor((col(orderCol).cast("long") - lit(lo)).cast("double") / lit(span) * lit(nParts))
        .cast("int")))
    val local = df.withColumn("__pid", bucket)
      .withColumn("__lcum", sum(col(valueCol)).over(
        Window.partitionBy(col("__pid")).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // one row per bucket -> driver; exclusive prefix = that bucket's offset
    val totals = local.groupBy(col("__pid")).agg(max(col("__lcum")).as("__ptotal"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, tot) => val o = (pid, acc); acc += tot; o }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__offset")
    local.join(broadcast(offsetsDf), "__pid")
      .withColumn(outCol, col("__lcum") + col("__offset"))
      .drop("__pid", "__lcum", "__offset")
  }

  /** Assign each document to its concat-and-chunk slot: `chunkCol` is the
    * index of the fixed-capacity chunk containing the doc's FIRST token,
    * `offsetCol` the doc's starting offset in the concatenated stream.
    * Long integer division throughout — safe past 2^53 total tokens.
    */
  def concatChunk(df: DataFrame, orderCol: String, tokensCol: String,
      chunkTokens: Long, chunkCol: String = "chunk_id",
      offsetCol: String = "stream_offset"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    withRunningTotal(df, orderCol, tokensCol, "__cum")
      .withColumn(offsetCol, col("__cum") - col(tokensCol))
      .withColumn(chunkCol, expr(s"$offsetCol div $chunkTokens"))
      .drop("__cum")
  }
}
