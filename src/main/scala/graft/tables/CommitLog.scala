package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

import TxLog.{AddFile, Snapshot}

/** The commit-log contract TxTable's write surface runs over. Two
  * implementations: the native `_graft_log` (TxLog) and the REAL Delta
  * protocol (`_delta_log`, DeltaLog/DeltaLogWriter). Abstracting the log
  * lets every table operation — append/overwrite with schema evolution,
  * replaceWhere, selective partition overwrite, MERGE/DELETE/UPDATE,
  * OPTIMIZE, time travel by version or timestamp, change feeds — run
  * unchanged against tables written by delta-rs / Delta-Spark / DuckDB,
  * which is the reference's primary path (its whole write matrix goes
  * through delta-rs on real Delta tables, uchelper/dataframe.py:299-488).
  *
  * Data staging is shared (TxLog.stageData — a distributed parquet job +
  * rename publish); only the metadata commit differs per log format.
  */
private[graft] sealed trait CommitLog {
  def snapshot(spark: SparkSession, location: String, asOfVersion: Option[Long] = None): Snapshot

  def latestVersion(spark: SparkSession, location: String): Option[Long]

  /** Pre-write gate; throws when the log's protocol refuses this writer
    * (Delta minWriterVersion / writerFeatures / appendOnly / invariants).
    */
  def checkWritable(spark: SparkSession, location: String, op: String): Unit

  /** Attempt an atomic commit at base.version+1 replacing `removedPaths`
    * with `added`. Returns false when a concurrent writer won the version
    * race (caller replans against the new snapshot and retries). `cdc`
    * carries staged change-data files for CDF tables (Delta log only).
    */
  def tryCommit(spark: SparkSession, location: String, base: Snapshot, op: String,
      added: Seq[AddFile], removedPaths: Seq[String],
      schema: StructType, partitionColumns: Seq[String],
      properties: Map[String, String], cdc: Seq[AddFile] = Seq.empty,
      txn: Option[TxLog.SetTxn] = None): Boolean

  /** Periodic checkpointing so snapshot replay stays O(interval). */
  def maybeCheckpoint(spark: SparkSession, location: String, version: Long): Unit

  /** Latest version committed at or before `tsMs` (timestamp travel). */
  def versionAtTimestamp(spark: SparkSession, location: String, tsMs: Long): Long

  /** (version, files added) per commit in (fromExclusive, toInclusive]. */
  def addsBetween(spark: SparkSession, location: String, fromExclusive: Long,
      toInclusive: Option[Long]): Seq[(Long, Seq[AddFile])]

  /** Plan a distributed read over a snapshot's active files. */
  def dfForSnapshot(spark: SparkSession, location: String, s: Snapshot): DataFrame

  /** Stage `df`'s parquet files for a commit against `snap` (logical
    * column names in, log-convention files out — the foreign Delta impl
    * physicalizes column-mapped tables before writing).
    */
  def stage(spark: SparkSession, location: String, df: DataFrame, snap: Snapshot): Seq[AddFile]

  /** Prepare a post-evolution schema for this log format: the foreign
    * Delta impl mints column ids / physical names for columns added to a
    * column-mapped table (and advances maxColumnId in the properties);
    * identity elsewhere.
    */
  def evolveMapping(base: StructType, evolved: StructType,
      props: Map[String, String]): (StructType, Map[String, String]) = (evolved, props)

  /** Create the table at `location` with `df` as version 0. */
  def create(spark: SparkSession, location: String, df: DataFrame,
      partitionColumns: Seq[String], properties: Map[String, String]): Unit

  /** Directory prefixes vacuum must never touch (the log itself). */
  def reservedPrefixes: Seq[String]
}

/** Native `_graft_log` backend — thin delegation to TxLog. */
private[graft] object NativeCommitLog extends CommitLog {
  def snapshot(spark: SparkSession, location: String, asOfVersion: Option[Long]): Snapshot =
    TxLog.snapshot(spark, location, asOfVersion)

  def latestVersion(spark: SparkSession, location: String): Option[Long] =
    TxLog.latestVersion(spark, location)

  def checkWritable(spark: SparkSession, location: String, op: String): Unit = ()

  def tryCommit(spark: SparkSession, location: String, base: Snapshot, op: String,
      added: Seq[AddFile], removedPaths: Seq[String],
      schema: StructType, partitionColumns: Seq[String],
      properties: Map[String, String], cdc: Seq[AddFile],
      txn: Option[TxLog.SetTxn]): Boolean =
    // cdc is a Delta-protocol concept; the native log's change feed is the
    // append-oriented changesSince
    TxLog.tryCommit(spark, location, TxLog.Commit(base.version + 1,
      System.currentTimeMillis(), op, schema.json, partitionColumns,
      added, removedPaths, properties, txn))

  def maybeCheckpoint(spark: SparkSession, location: String, version: Long): Unit =
    if (version > 0 && version % TxLog.CheckpointInterval == 0)
      TxLog.writeCheckpoint(spark, location, TxLog.snapshot(spark, location))

  def versionAtTimestamp(spark: SparkSession, location: String, tsMs: Long): Long =
    TxLog.versionAtTimestamp(spark, location, tsMs)

  def addsBetween(spark: SparkSession, location: String, fromExclusive: Long,
      toInclusive: Option[Long]): Seq[(Long, Seq[AddFile])] =
    TxLog.commitsBetween(spark, location, fromExclusive, toInclusive)
      // compaction commits rearrange bytes, not data — surfacing their
      // adds would re-emit the whole table into change feeds / streams
      .filterNot(c => c.operation == "OPTIMIZE" || c.operation == "ZORDER")
      .map(c => c.version -> c.added)

  def dfForSnapshot(spark: SparkSession, location: String, s: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (s.files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s.schema)
    } else {
      val paths = s.files.map(f => s"$location/${f.path}")
      val reader = spark.read.schema(s.schema)
      (if (s.partitionColumns.nonEmpty) reader.option("basePath", location) else reader)
        .parquet(paths: _*)
        .select(s.schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }

  def stage(spark: SparkSession, location: String, df: DataFrame, snap: Snapshot): Seq[AddFile] =
    TxLog.stageData(spark, location,
      Constraints.enforce(GeneratedColumns.validate(df, snap.schema),
        snap.properties, snap.schema), snap.partitionColumns)

  def create(spark: SparkSession, location: String, df0: DataFrame,
      partitionColumns: Seq[String], properties: Map[String, String]): Unit = {
    if (TxLog.exists(spark, location))
      throw graft.catalog.AlreadyExistsError(s"transaction log already exists at $location")
    val df = IdentityColumns.stampCreate(df0)
    val added = TxLog.stageData(spark, location,
      Constraints.enforce(GeneratedColumns.validate(df, df.schema), properties, df.schema),
      partitionColumns)
    val c = TxLog.Commit(0L, System.currentTimeMillis(), "CREATE", df.schema.json,
      partitionColumns, added, Seq.empty, properties)
    if (!TxLog.tryCommit(spark, location, c))
      throw graft.catalog.AlreadyExistsError(s"concurrent create at $location")
  }

  def reservedPrefixes: Seq[String] = Seq(TxLog.LogDirName, TxLog.StagingPrefix)
}

/** Real Delta protocol backend: snapshots replayed from `_delta_log`,
  * commits written as spec-compliant newline-JSON actions through
  * DeltaLogWriter — so schema evolution emits a new metaData action,
  * rewrites emit remove+add with per-file stats, and external engines can
  * keep reading the table after every operation.
  */
private[graft] object ForeignDeltaCommitLog extends CommitLog {
  private implicit val formats: Formats = DefaultFormats

  def snapshot(spark: SparkSession, location: String, asOfVersion: Option[Long]): Snapshot =
    DeltaLog.snapshot(spark, location, asOfVersion)

  def latestVersion(spark: SparkSession, location: String): Option[Long] =
    DeltaLog.latestVersion(spark, location)

  def checkWritable(spark: SparkSession, location: String, op: String): Unit =
    DeltaLogWriter.requireWritable(spark, location,
      // appendOnly blocks data removal, not blind appends or pure
      // metadata commits (Delta allows property changes on such tables)
      forOverwrite = op != "APPEND" && op != "SET_TBLPROPERTIES")
    // row-tracked rewrites are supported: TxTable's rewrite paths read the
    // rows' ids (materialized-over-fresh) and materialize them into the
    // replacement files (RowTracking), so lineage survives
    // DELETE/UPDATE/MERGE/OPTIMIZE — no refusal needed anymore

  def tryCommit(spark: SparkSession, location: String, base: Snapshot, op: String,
      added: Seq[AddFile], removedPaths: Seq[String],
      schema: StructType, partitionColumns: Seq[String],
      properties: Map[String, String], cdc: Seq[AddFile],
      txn: Option[TxLog.SetTxn]): Boolean = {
    // in-commit timestamps: when enabled, commitInfo must carry a
    // MONOTONIC inCommitTimestamp (max of the wall clock and prev + 1) and
    // time travel reads it instead of file mtimes
    def ictOn(p: Map[String, String]): Boolean =
      p.get("delta.enableInCommitTimestamps").exists(_.equalsIgnoreCase("true"))
    val ictValue: Option[Long] =
      if (!ictOn(properties)) None
      else {
        val f = TxLog.fs(spark, location)
        val prev = DeltaLog.latestVersion(spark, location).map { v =>
          DeltaLog.commitTimestamp(f,
            new org.apache.hadoop.fs.Path(DeltaLog.logDir(location), f"$v%020d.json"))
        }.getOrElse(0L)
        Some(math.max(System.currentTimeMillis(), prev + 1))
      }
    val ictField: List[(String, JValue)] =
      ictValue.map(v => "inCommitTimestamp" -> (JLong(v): JValue)).toList
    // the commit that TURNS ICT ON for an existing table must record where
    // the monotonic clock starts (PROTOCOL.md "In-Commit Timestamps"):
    // spec-compliant readers resolve timestamp time travel below the
    // enablement version via file mtimes, at/above it via ICT
    val properties1 =
      if (!ictOn(properties) || ictOn(base.properties)) properties
      else properties ++ Map(
        "delta.inCommitTimestampEnablementVersion" -> (base.version + 1).toString,
        "delta.inCommitTimestampEnablementTimestamp" -> ictValue.get.toString)
    val commitInfo = JsonMethods.compact(JsonMethods.render(JObject("commitInfo" -> JObject(
      List[(String, JValue)](
        "timestamp" -> JLong(System.currentTimeMillis()),
        "operation" -> JString(deltaOperation(op)),
        "operationParameters" -> JObject("mode" -> JString(op))) ++ ictField))))
    // SetTransaction rides in the same atomic commit as the data it marks
    // (PROTOCOL.md "Transaction Identifiers")
    val txnLine = txn.toSeq.map(t => JsonMethods.compact(JsonMethods.render(JObject(
      "txn" -> JObject(
        "appId" -> JString(t.appId),
        "version" -> JLong(t.version),
        "lastUpdated" -> JLong(t.lastUpdated.getOrElse(System.currentTimeMillis())))))))
    // compaction rearranges bytes, not data: its add/remove actions carry
    // dataChange=false so CDF readers and streaming sources skip them
    val dataChange = op != "OPTIMIZE" && op != "ZORDER"
    // a metadata change (schema evolution, property update) must be a new
    // metaData action in the same commit, preserving the table's identity
    val metaChanged = schema.json != base.schema.json ||
      partitionColumns != base.partitionColumns || properties1 != base.properties
    val metaLine: Seq[String] = if (!metaChanged) Seq.empty else {
      val (state, _) = DeltaLog.replayState(spark, location, None)
      Seq(JsonMethods.compact(JsonMethods.render(JObject("metaData" -> JObject(
        "id" -> JString(Option(state.metaId).filter(_.nonEmpty)
          .getOrElse(java.util.UUID.randomUUID().toString)),
        "format" -> JObject("provider" -> JString("parquet"), "options" -> JObject()),
        "schemaString" -> JString(schema.json),
        "partitionColumns" -> JArray(partitionColumns.toList.map(JString(_))),
        "configuration" -> JObject(properties1.toList.map { case (k, v) => k -> JString(v) }))))))
    }
    // a commit whose schema or properties newly exercise a feature (CHECK
    // constraint, CDF, ICT, row tracking, generated/identity/NTZ/variant
    // columns) must also oblige OTHER writers to honor it — legacy writer
    // version bump or table features, per protocolUpgradeFor
    val protoLine = DeltaLogWriter.protocolUpgradeFor(spark, location,
      base.schema, base.properties, schema, properties1)
    // row tracking: stamp each add with its id range and advance the
    // watermark in the SAME commit (domainMetadata action)
    val (added1, rtLine) =
      if (!RowTracking.enabled(properties1)) (added, None)
      else {
        val (state, _) = DeltaLog.replayState(spark, location, None)
        RowTracking.stamp(added, RowTracking.highWaterMark(state.domains), base.version + 1)
      }
    val lines = (commitInfo +: (txnLine ++ rtLine ++ protoLine ++ metaLine)) ++
      removedPaths.map(DeltaLogWriter.removeAction(_, dataChange)) ++
      added1.map(DeltaLogWriter.addAction(schema, _, dataChange)) ++
      cdc.map(DeltaCdf.cdcAction)
    try {
      DeltaLogWriter.writeCommit(spark, location, base.version + 1, lines)
      true
    } catch { case _: graft.catalog.AlreadyExistsError => false }
  }

  private def deltaOperation(op: String): String = op match {
    case "APPEND" | "OVERWRITE" | "REPLACE_WHERE" | "OVERWRITE_PARTITIONS" => "WRITE"
    case "ZORDER" | "OPTIMIZE" => "OPTIMIZE"
    case other => other // MERGE, DELETE, UPDATE match Delta's names already
  }

  def maybeCheckpoint(spark: SparkSession, location: String, version: Long): Unit =
    DeltaLogWriter.maybeCheckpoint(spark, location, version)

  def versionAtTimestamp(spark: SparkSession, location: String, tsMs: Long): Long =
    DeltaLog.versionAtTimestamp(spark, location, tsMs)

  def addsBetween(spark: SparkSession, location: String, fromExclusive: Long,
      toInclusive: Option[Long]): Seq[(Long, Seq[AddFile])] =
    DeltaLog.addsBetween(spark, location, fromExclusive, toInclusive)

  def dfForSnapshot(spark: SparkSession, location: String, s: Snapshot): DataFrame =
    DeltaLog.dfForSnapshot(spark, location, s)

  def stage(spark: SparkSession, location: String, df: DataFrame, snap: Snapshot): Seq[AddFile] =
    // constraints and generated columns check LOGICAL column names, before
    // any column-mapping physicalization inside stageForDelta
    DeltaLogWriter.stageForDelta(spark, location,
      Constraints.enforce(GeneratedColumns.validate(df, snap.schema),
        snap.properties, snap.schema), snap)

  override def evolveMapping(base: StructType, evolved: StructType,
      props: Map[String, String]): (StructType, Map[String, String]) =
    DeltaLog.evolveMapping(base, evolved, props)

  def create(spark: SparkSession, location: String, df: DataFrame,
      partitionColumns: Seq[String], properties: Map[String, String]): Unit =
    DeltaLogWriter.create(spark, location, df, partitionColumns, properties)

  def reservedPrefixes: Seq[String] = Seq(DeltaLog.LogDirName, TxLog.StagingPrefix)
}
