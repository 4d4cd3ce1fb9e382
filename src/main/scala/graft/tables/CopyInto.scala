package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.UnsupportedOperationError

/** COPY INTO — idempotent bulk file ingestion (Delta's `COPY INTO`
  * statement shape; the reference's write surface has no ingest-dedup
  * story, so re-running a load script double-loads — this is the
  * standard lakehouse answer).
  *
  * Semantics: load every data file under a source directory into the
  * target table EXACTLY ONCE across any number of invocations — the
  * nightly "pick up whatever landed in the drop zone" job can simply
  * re-run after any failure.
  *
  * Exactly-once protocol (write-ahead intent + transactional confirm):
  *  1. `newFiles` = source listing ∖ files already recorded in the
  *     INGEST LOG — itself a native TxTable under
  *     `<target>/_graft_ingest/log`, one row per loaded source file.
  *  2. Record the INTENT: append `newFiles` rows to the ingest log
  *     stamped with batch number B, committed idempotently
  *     (SetTransaction appId `graft.copyInto.intent`, version B) — a
  *     concurrent runner racing to the same B loses the commit and
  *     retries against the refreshed log.
  *  3. Load the data: read exactly the intent's files and append to the
  *     target with SetTransaction (`graft.copyInto`, B) — Delta's own
  *     idempotent-writer mechanism, atomic with the data.
  * A crash between 2 and 3 leaves a recorded intent whose batch never
  * confirmed on the target: the next run detects
  * `target.transactions(appId) < maxBatch(ingest log)` and REPLAYS step
  * 3 for exactly the recorded file list before computing new work.
  * Every step is an atomic commit on one of the two logs, so any
  * interleaving of crashes and re-runs loads each file once.
  *
  * Scale shape: the source listing is driver-held file METADATA (the
  * same order as the table's own snapshot); dedup against the ingest
  * log is an executor-side anti-join (driver sees only the NEW paths);
  * the data read is a normal distributed scan of just the new files.
  * Nothing driver-side scales with rows.
  */
object CopyInto {
  val TxnAppId = "graft.copyInto"
  private val IntentAppId = "graft.copyInto.intent"

  /** Reserved ingest-state root under the table location (vacuum must
    * never touch it). */
  val IngestRoot = "_graft_ingest"

  final case class Result(filesLoaded: Long, rowsLoaded: Long, batch: Long)

  private def logLocation(target: TxTable): String =
    s"${target.location}/$IngestRoot/log"

  private[tables] def supportedFormat(f: String): Boolean =
    Seq("parquet", "csv", "json").contains(f.toLowerCase(java.util.Locale.ROOT))

  /** (absolute URI, size, mtime) of every visible data file of `format`
    * under `sourceDir` (hidden `_`/`.` segments skipped, hadoop
    * convention), optionally filtered by a glob over the relative path.
    */
  private def listSource(spark: SparkSession, sourceDir: String, format: String,
      pattern: Option[String]): Seq[(String, Long, Long)] = {
    val p = new Path(sourceDir)
    val fs = TxLog.fs(spark, sourceDir)
    if (!fs.exists(p))
      throw UnsupportedOperationError(s"COPY INTO: source '$sourceDir' does not exist")
    val ext = "." + format.toLowerCase(java.util.Locale.ROOT)
    val matcher = pattern.map(g =>
      java.nio.file.FileSystems.getDefault.getPathMatcher("glob:" + g))
    val baseUri = p.toUri.getPath
    val out = Seq.newBuilder[(String, Long, Long)]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) {
        val rel = st.getPath.toUri.getPath.stripPrefix(baseUri).stripPrefix("/")
        val hidden = rel.split('/').exists(s => s.startsWith("_") || s.startsWith("."))
        val wanted = matcher.forall(_.matches(java.nio.file.Paths.get(rel)))
        if (!hidden && wanted && rel.toLowerCase(java.util.Locale.ROOT).endsWith(ext))
          out += ((st.getPath.toUri.toString, st.getLen, st.getModificationTime))
      }
    }
    out.result()
  }

  /** Read `paths` as `format` aligned to the target's columns — parquet
    * resolves by name; csv/json read with the target schema declared
    * (csv headers are required and matched by name).
    */
  private def readFiles(spark: SparkSession, target: TxTable, format: String,
      paths: Seq[String]): DataFrame = {
    val schema = target.snapshot.schema
    val base = format.toLowerCase(java.util.Locale.ROOT) match {
      case "parquet" => spark.read.parquet(paths: _*)
      case "csv" => spark.read.schema(schema).option("header", "true").csv(paths: _*)
      case "json" => spark.read.schema(schema).json(paths: _*)
      case other => throw UnsupportedOperationError(
        s"COPY INTO: FILEFORMAT $other not supported (parquet, csv, json)")
    }
    val missing = schema.fieldNames.filterNot(base.columns.contains)
    if (missing.nonEmpty)
      throw UnsupportedOperationError(
        s"COPY INTO: source lacks target columns ${missing.mkString(", ")}")
    base.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  def run(target: TxTable, sourceDir: String, format: String = "parquet",
      pattern: Option[String] = None): Result = {
    if (!supportedFormat(format))
      throw UnsupportedOperationError(
        s"COPY INTO: FILEFORMAT $format not supported (parquet, csv, json)")
    val spark = target.spark
    val listing = listSource(spark, sourceDir, format, pattern)
    val ingest = new TxTable(spark, logLocation(target))
    val ingestExists = NativeCommitLog.latestVersion(spark, ingest.location).isDefined

    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 5)
        throw UnsupportedOperationError(
          "COPY INTO: lost the intent-batch race 5 times; concurrent runners?")
      import spark.implicits._
      val recorded: Option[DataFrame] =
        if (ingestExists || NativeCommitLog.latestVersion(spark, ingest.location).isDefined)
          Some(ingest.toDF)
        else None
      val maxBatch: Long = recorded
        .map(_.agg(max(col("batch"))).head() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }).getOrElse(0L)

      // crash recovery: an intent whose batch never confirmed on the
      // target replays EXACTLY its recorded files (idempotent: the
      // SetTransaction guard makes a double replay a no-op)
      val confirmed = target.snapshot.transactions.getOrElse(TxnAppId, 0L)
      if (confirmed < maxBatch) {
        ((confirmed + 1) to maxBatch).foreach { b =>
          val bPaths = recorded.get.filter(col("batch") === lit(b))
            .select("source_path").as[String].collect().toSeq
          if (bPaths.nonEmpty)
            target.appendIdempotent(readFiles(spark, target, format, bPaths), TxnAppId, b)
        }
      }

      // dedup: executor-side anti-join — the driver sees only NEW paths
      val newFiles: Seq[(String, Long, Long)] = recorded match {
        case None => listing
        case Some(df) =>
          val listDf = listing.toDF("source_path", "size_bytes", "mtime")
          listDf.join(df.select("source_path"), Seq("source_path"), "left_anti")
            .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      }
      if (newFiles.isEmpty) return Result(0L, 0L, maxBatch)

      val batch = maxBatch + 1
      val records = newFiles.toDF("source_path", "size_bytes", "mtime")
        .withColumn("batch", lit(batch))
      // write-ahead intent, idempotent per batch number: a concurrent
      // runner racing to the same batch loses and retries
      val won =
        if (recorded.isEmpty) { ingest.create(records); true }
        else ingest.appendIdempotent(records, IntentAppId, batch)
      if (won) {
        val before = target.countRows()
        target.appendIdempotent(
          readFiles(spark, target, format, newFiles.map(_._1)), TxnAppId, batch)
        val after = target.countRows()
        val rows = if (before >= 0L && after >= 0L) after - before else -1L
        return Result(newFiles.size.toLong, rows, batch)
      }
      // lost the race: refreshed state next iteration
    }
    throw new IllegalStateException("unreachable")
  }
}
