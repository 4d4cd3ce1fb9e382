package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.tables.TxTable

/** Incremental consumption of a transactional table's change feed with a
  * durable cursor — the batch-mode equivalent of a streaming source over
  * the log (Trigger.AvailableNow semantics): each call processes exactly
  * the commits that landed since the last successful call.
  *
  * Delivery guarantee: the cursor advances only AFTER the batch function
  * returns, so a crash mid-batch re-delivers that batch (at-least-once);
  * pair with an idempotent sink (e.g. replaceWhere on `_commit_version`,
  * or TxTable MERGE on keys) for effective exactly-once — the same
  * contract as Structured Streaming's foreachBatch.
  *
  * Scale posture: the cursor is one tiny JSON file; each batch is a
  * distributed read of exactly the newly added files (no rescan of the
  * table), so cost tracks the delta, not the table size.
  */
object TxIncremental {

  private val CursorFile = "cursor.json"

  /** Last version processed, or -1 before the first batch. */
  def lastProcessedVersion(t: TxTable, checkpointDir: String): Long = {
    val f = new Path(checkpointDir).getFileSystem(t.spark.sessionState.newHadoopConf())
    val p = new Path(checkpointDir, CursorFile)
    if (!f.exists(p)) return -1L
    val in = f.open(p)
    try {
      val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      """"version"\s*:\s*(-?\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong).getOrElse(-1L)
    } finally in.close()
  }

  private def writeCursor(t: TxTable, checkpointDir: String, version: Long): Unit = {
    val f = new Path(checkpointDir).getFileSystem(t.spark.sessionState.newHadoopConf())
    val dir = new Path(checkpointDir)
    if (!f.exists(dir)) f.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"""{"version":$version}""".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(dir, CursorFile)
    if (f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"failed to advance cursor at $target")
  }

  /** Process the commits since the cursor as one batch. Returns the number
    * of versions consumed (0 = nothing new; `f` is not called). The batch
    * DataFrame is the change feed (rows + `_commit_version`); `f` runs
    * before the cursor advances.
    */
  def processAvailable(t: TxTable, checkpointDir: String)(f: DataFrame => Unit): Int = {
    val from = lastProcessedVersion(t, checkpointDir)
    // cursor -1 means "from the beginning" INCLUDING the create commit
    val latest = t.version
    if (latest <= from) return 0
    val batch = t.changesSince(math.max(from, -1L), Some(latest))
    f(batch)
    writeCursor(t, checkpointDir, latest)
    (latest - math.max(from, -1L)).toInt
  }
}
