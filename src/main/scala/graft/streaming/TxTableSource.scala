package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.tables.{TxLog, TxTable}

/** Structured Streaming SOURCE over a transactional table: log versions
  * are the offsets, each micro-batch is exactly the rows added by commits
  * in (startVersion, endVersion] tagged `_commit_version` — the
  * Delta-source shape (append-only; removes are ignored). Offsets are
  * durable via the normal streaming checkpoint, so restarts resume at the
  * committed version with exactly-once batch boundaries.
  *
  *   spark.readStream.format("graft.streaming.TxTableSourceProvider")
  *     .option("maxVersionsPerTrigger", "10")  // optional rate limit
  *     .load(tablePath)
  *
  * Scale posture: discovering a batch is a log-tail read (O(new commits),
  * no directory listing, no full-table scan); the batch itself is a
  * distributed parquet read of just the new files.
  * `maxVersionsPerTrigger` bounds each micro-batch to that many commits,
  * `maxBytesPerTrigger` ("128m", "1g", or plain bytes) to roughly that
  * many added bytes (a soft cap at commit granularity — an oversized
  * single commit still arrives whole, so progress is guaranteed) —
  * without a limit, a cold start against a long-history table (or a
  * backlog after downtime) becomes one giant first batch. A commit is
  * the atomic unit: its files are never split across batches, so batch
  * boundaries stay transactional. Both limits compose; the byte walk
  * costs one log-tail metadata read per trigger, never a data scan.
  */
class TxTableSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-tx"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), TxTableSource.streamSchema(sqlContext.sparkSession,
      TxTableSource.path(parameters), TxTableSource.readChangeFeed(parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new TxTableSource(sqlContext.sparkSession, TxTableSource.path(parameters),
      TxTableSource.maxVersionsPerTrigger(parameters),
      TxTableSource.readChangeFeed(parameters),
      TxTableSource.maxBytesPerTrigger(parameters))
}

object TxTableSource {
  private[streaming] def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw graft.catalog.UnsupportedOperationError("graft-tx source requires .load(<table path>)"))

  private[streaming] def maxVersionsPerTrigger(parameters: Map[String, String]): Option[Long] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxVersionsPerTrigger") => v.toLong
    }.map { n =>
      require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
      n
    }

  /** Delta-style size strings: plain bytes or k/kb/m/mb/g/gb suffixes. */
  private[streaming] def maxBytesPerTrigger(parameters: Map[String, String]): Option[Long] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxBytesPerTrigger") =>
        val s = v.trim.toLowerCase(java.util.Locale.ROOT)
        val m = """(\d+)\s*(kb?|mb?|gb?)?""".r
        val n = s match {
          case m(num, suffix) =>
            val mult = Option(suffix).map(_.head) match {
              case Some('k') => 1L << 10
              case Some('m') => 1L << 20
              case Some('g') => 1L << 30
              case _ => 1L
            }
            num.toLong * mult
          case _ => throw new IllegalArgumentException(
            s"maxBytesPerTrigger: unparseable size '$v' (use bytes or k/m/g suffixes)")
        }
        require(n > 0, s"maxBytesPerTrigger must be positive, got $n")
        n
    }

  private[streaming] def readChangeFeed(parameters: Map[String, String]): Boolean =
    parameters.exists { case (k, v) =>
      k.equalsIgnoreCase("readChangeFeed") && v.equalsIgnoreCase("true")
    }

  /** Table handle with commit-log auto-dispatch, so the SAME source streams
    * native `_graft_log` tables AND real Delta `_delta_log` tables (the
    * shape of Delta's own streaming source).
    */
  private[streaming] def table(spark: SparkSession, location: String): TxTable =
    TxTable.forAnyLocation(spark, location)

  private[streaming] def streamSchema(spark: SparkSession, location: String,
      cdf: Boolean = false): StructType =
    if (cdf)
      // Delta's readChangeFeed stream shape: rows + change metadata
      StructType(table(spark, location).snapshot.schema.fields ++ Seq(
        StructField("_change_type", org.apache.spark.sql.types.StringType),
        StructField("_commit_version", LongType, nullable = false),
        StructField("_commit_timestamp", org.apache.spark.sql.types.TimestampType)))
    else
      StructType(table(spark, location).snapshot.schema.fields :+
        StructField("_commit_version", LongType, nullable = false))
}

class TxTableSource(spark: SparkSession, location: String,
    maxVersionsPerTrigger: Option[Long] = None,
    readChangeFeed: Boolean = false,
    maxBytesPerTrigger: Option[Long] = None) extends Source {

  private case class TxOffset(version: Long) extends Offset {
    override def json: String = s"""{"version":$version}"""
  }

  private def versionOf(o: Offset): Long = o match {
    case TxOffset(v) => v
    case other => // SerializedOffset round-trip from the checkpoint log
      """"version"\s*:\s*(-?\d+)""".r.findFirstMatchIn(other.json)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalStateException(s"unparseable offset ${other.json}"))
  }

  override val schema: StructType =
    TxTableSource.streamSchema(spark, location, readChangeFeed)

  private val table = TxTableSource.table(spark, location)
  // fail fast: CDF streaming needs a row-level feed — the Delta change
  // feed, or the Iceberg snapshot-diff changelog (which raises
  // mid-stream on overwrite/equality-delete commits; bound those
  // histories with a fresh start instead)
  if (readChangeFeed && !(table.log eq graft.tables.ForeignDeltaCommitLog) &&
      !(table.log eq graft.tables.IcebergCommitLog))
    throw graft.catalog.UnsupportedOperationError(
      "readChangeFeed streaming requires a Delta (_delta_log) or Iceberg " +
        "table; the native log streams appends only")

  /** Highest version already handed out in a batch — the rate limit's
    * base. Synced from the checkpoint on restart: the engine replays the
    * last committed batch through getBatch before asking for new offsets.
    */
  @volatile private var lastSeen: Option[Long] = None

  override def getOffset: Option[Offset] = {
    val latest = table.log.latestVersion(spark, location)
    latest match {
      case Some(l) if maxVersionsPerTrigger.isDefined || maxBytesPerTrigger.isDefined =>
        val base = lastSeen.getOrElse(-1L)
        val byVersions = maxVersionsPerTrigger.map(m => math.min(l, base + m)).getOrElse(l)
        val capped = maxBytesPerTrigger match {
          case None => byVersions
          case Some(maxB) if byVersions <= base => byVersions
          case Some(maxB) =>
            // walk the commit tail, stopping at the first COMMIT boundary
            // that would push the batch past the byte budget — but always
            // take at least one commit, so an oversized single commit
            // still makes progress (Delta's maxBytesPerTrigger contract:
            // a soft cap at atomic commit granularity)
            val byV: Map[Long, Long] =
              table.log.addsBetween(spark, location, base, Some(byVersions))
                .map { case (v, adds) => v -> adds.map(_.sizeBytes).sum }.toMap
            var acc = 0L
            var end = base
            var v = base + 1
            var full = false
            while (v <= byVersions && !full) {
              val sz = byV.getOrElse(v, 0L)
              if (end > base && acc + sz > maxB) full = true
              else { acc += sz; end = v; v += 1 }
            }
            end
        }
        if (capped <= base) Some(TxOffset(base)) else Some(TxOffset(capped))
      case l => l.map(TxOffset)
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(-1L)
    val to = versionOf(end)
    lastSeen = Some(math.max(lastSeen.getOrElse(-1L), to))
    val changes =
      if (readChangeFeed) table.tableChanges(from + 1, Some(to))
      else table.changesSince(from, Some(to))
    val batch = changes
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    // the engine asserts isStreaming on the returned frame
    org.apache.spark.sql.GraftColumnBridge.streamingDataFrame(
      spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
