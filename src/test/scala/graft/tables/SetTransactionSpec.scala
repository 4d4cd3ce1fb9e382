package graft.tables

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Delta SetTransaction ("txn") support: idempotent appends keyed on an
  * application (appId, version) watermark committed atomically with the
  * data, on BOTH log formats — the mechanism delta-rs / Delta-Spark
  * streaming sinks use for exactly-once (PROTOCOL.md "Transaction
  * Identifiers"; reference tables are delta-rs-written, so foreign logs
  * may carry txn actions from other engines).
  */
class SetTransactionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(n: Int, tag: String): DataFrame =
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "s")

  test("native log: duplicate (appId, version) append is skipped, higher version lands") {
    val loc = TestSpark.tmpDir("txn-native") + "/t"
    val t = new TxTable(spark, loc)
    t.create(rows(2, "base"))
    assert(t.latestTxnVersion("job-a").isEmpty)

    assert(t.appendIdempotent(rows(3, "b0"), "job-a", 0L))
    assert(t.toDF.count() == 5)
    assert(t.latestTxnVersion("job-a").contains(0L))

    // re-run of batch 0 (crash recovery shape): no-op
    assert(!t.appendIdempotent(rows(3, "b0"), "job-a", 0L))
    assert(t.toDF.count() == 5)

    // a LOWER version is also already-applied (watermark is monotone)
    assert(!t.appendIdempotent(rows(3, "b-1"), "job-a", -1L))

    // next batch lands; a different appId tracks independently
    assert(t.appendIdempotent(rows(1, "b1"), "job-a", 1L))
    assert(t.appendIdempotent(rows(1, "other"), "job-b", 0L))
    assert(t.toDF.count() == 7)
    assert(t.latestTxnVersion("job-a").contains(1L))
    assert(t.latestTxnVersion("job-b").contains(0L))
  }

  test("native log: txn watermarks survive a checkpointed replay") {
    val loc = TestSpark.tmpDir("txn-native-ckpt") + "/t"
    val t = new TxTable(spark, loc)
    t.create(rows(1, "base"))
    t.appendIdempotent(rows(1, "w"), "job-ck", 7L)
    // push past CheckpointInterval so the snapshot replays from the
    // checkpoint, not the full JSON history
    (1 to TxLog.CheckpointInterval + 1).foreach(i => t.append(rows(1, s"f$i")))
    val snap = TxLog.snapshot(spark, loc)
    assert(snap.version > TxLog.CheckpointInterval)
    assert(snap.transactions.get("job-ck").contains(7L))
    assert(!t.appendIdempotent(rows(1, "dup"), "job-ck", 7L))
  }

  test("iceberg log: watermarks ride the metadata commit; duplicates skipped; props stay clean") {
    val loc = TestSpark.tmpDir("txn-ice") + "/t"
    IcebergWriter.create(spark, loc, rows(2, "base"))
    val t = TxTable.forIceberg(spark, loc)
    assert(t.latestTxnVersion("job-i").isEmpty)

    assert(t.appendIdempotent(rows(3, "b0"), "job-i", 0L))
    assert(t.toDF.count() == 5)
    assert(t.latestTxnVersion("job-i").contains(0L))
    // replayed batch is a no-op; lower versions already applied
    assert(!t.appendIdempotent(rows(3, "b0"), "job-i", 0L))
    assert(!t.appendIdempotent(rows(3, "b-1"), "job-i", -1L))
    assert(t.toDF.count() == 5)
    // the encoding property never leaks into user-facing properties
    assert(!t.snapshot.properties.keys.exists(_.startsWith("graft.txn.")))
    // a later batch + an independent appId land; watermarks survive
    // UNRELATED commits (the metadata carry)
    assert(t.appendIdempotent(rows(1, "b1"), "job-i", 1L))
    t.append(rows(1, "plain"))
    assert(t.latestTxnVersion("job-i").contains(1L))
    assert(t.appendIdempotent(rows(1, "other"), "job-x", 5L))
    assert(t.latestTxnVersion("job-i").contains(1L))
    assert(t.latestTxnVersion("job-x").contains(5L))
    assert(t.toDF.count() == 8)
  }

  test("foreign Delta: txn action is spec-shaped JSON and replays; duplicates skipped") {
    val loc = TestSpark.tmpDir("txn-delta") + "/t"
    DeltaLogWriter.create(spark, loc, rows(2, "base"))
    val t = TxTable.forForeignDelta(spark, loc)

    assert(t.appendIdempotent(rows(3, "b0"), "stream-1", 0L))
    assert(!t.appendIdempotent(rows(3, "b0"), "stream-1", 0L))
    assert(t.toDF.count() == 5)
    assert(t.latestTxnVersion("stream-1").contains(0L))

    // the commit file carries a protocol-correct txn action
    val f = TxLog.fs(spark, loc)
    val v1 = new org.apache.hadoop.fs.Path(loc, "_delta_log/00000000000000000001.json")
    val txt = scala.io.Source.fromInputStream(f.open(v1), "UTF-8").mkString
    val txnLine = txt.linesIterator.find(_.contains("\"txn\"")).getOrElse(fail(s"no txn action in $txt"))
    val parsed = org.json4s.jackson.JsonMethods.parse(txnLine)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    assert((parsed \ "txn" \ "appId").extract[String] == "stream-1")
    assert((parsed \ "txn" \ "version").extract[Long] == 0L)
    assert((parsed \ "txn" \ "lastUpdated").extract[Long] > 0L)
  }

  test("foreign Delta: txn action written by another engine is honored") {
    val loc = TestSpark.tmpDir("txn-delta-foreign") + "/t"
    DeltaLogWriter.create(spark, loc, rows(2, "base"))
    // hand-write a commit with only a txn action, as delta-rs's
    // `commit(..., app_transactions=...)` would
    DeltaLogWriter.writeCommit(spark, loc, 1L, Seq(
      """{"commitInfo":{"timestamp":1,"operation":"STREAMING UPDATE","operationParameters":{}}}""",
      """{"txn":{"appId":"rs-app","version":41,"lastUpdated":1}}"""))
    val t = TxTable.forForeignDelta(spark, loc)
    assert(t.latestTxnVersion("rs-app").contains(41L))
    assert(!t.appendIdempotent(rows(1, "old"), "rs-app", 41L))
    assert(t.appendIdempotent(rows(1, "new"), "rs-app", 42L))
  }

  test("foreign Delta: txn watermarks survive classic AND v2 checkpoints") {
    for (v2 <- Seq(false, true)) {
      val loc = TestSpark.tmpDir(s"txn-delta-ckpt-$v2") + "/t"
      DeltaLogWriter.create(spark, loc, rows(1, "base"),
        properties = if (v2) Map.empty else Map.empty)
      val t = TxTable.forForeignDelta(spark, loc)
      if (v2) {
        // flip the table to v2Checkpoint via a protocol upgrade commit
        DeltaLogWriter.writeCommit(spark, loc, 1L, Seq(
          """{"commitInfo":{"timestamp":1,"operation":"UPGRADE PROTOCOL","operationParameters":{}}}""",
          """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}"""))
      }
      t.appendIdempotent(rows(1, "w"), "ckpt-app", 3L)
      (1 to DeltaLogWriter.CheckpointInterval + 1).foreach(i => t.append(rows(1, s"f$i")))
      // a checkpoint exists at/above the interval; delete the JSON tail the
      // checkpoint covers to prove the watermark comes from the CHECKPOINT
      val f = TxLog.fs(spark, loc)
      val logDir = new org.apache.hadoop.fs.Path(loc, "_delta_log")
      val ckptV = f.listStatus(logDir).map(_.getPath.getName)
        .filter(_.contains(".checkpoint.")).flatMap(_.takeWhile(_ != '.').toLongOption)
        .maxOption.getOrElse(fail("no checkpoint written"))
      f.listStatus(logDir).map(_.getPath).filter { p =>
        p.getName.endsWith(".json") && !p.getName.startsWith(".") &&
          p.getName.stripSuffix(".json").toLongOption.exists(_ <= ckptV)
      }.foreach(p => f.delete(p, false))
      val snap = DeltaLog.snapshot(spark, loc)
      assert(snap.transactions.get("ckpt-app").contains(3L),
        s"v2=$v2: transactions=${snap.transactions}")
    }
  }

  test("stream restart with a WIPED checkpoint re-delivers batches as no-ops") {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = TestSpark.tmpDir("txn-restart-src")
    val tblDir = TestSpark.tmpDir("txn-restart-tbl") + "/t"
    val ckpt1 = TestSpark.tmpDir("txn-restart-ck1")
    val ckpt2 = TestSpark.tmpDir("txn-restart-ck2")

    Seq((1L, 1000000000L * 60, 10L, "click", 1.0, "{}"),
      (2L, 1000000000L * 120, 10L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(srcDir + "/b1")

    def run(ckpt: String): Unit = {
      val stream = graft.streaming.StreamOps.eventFileStream(spark, srcDir + "/*")
        .select("event_id", "user_id", "event_type", "value")
      val q = graft.streaming.StreamOps.writeToTxTable(stream, tblDir, ckpt,
        Trigger.AvailableNow(), appId = Some("restart-app"))
      q.awaitTermination(60000)
    }
    run(ckpt1)
    assert(TxTable.forLocation(spark, tblDir).toDF.count() == 2)
    // a FRESH checkpoint restarts batch numbering at 0 and re-reads the
    // source — the worst-case crash-recovery shape. The txn watermark in
    // the TABLE (not the stream checkpoint) makes the re-run a no-op.
    run(ckpt2)
    assert(TxTable.forLocation(spark, tblDir).toDF.count() == 2)
  }

  test("streaming sink is exactly-once across a re-run batch") {
    val loc = TestSpark.tmpDir("txn-sink") + "/t"
    val t = new TxTable(spark, loc)
    t.create(rows(0, "seed"))
    val appId = "graft-sink-test"
    // simulate foreachBatch delivering batch 5 twice (checkpoint lag after
    // a crash): second delivery must be a no-op
    assert(t.appendIdempotent(rows(4, "b5"), appId, 5L))
    assert(!t.appendIdempotent(rows(4, "b5"), appId, 5L))
    assert(t.appendIdempotent(rows(2, "b6"), appId, 6L))
    assert(t.toDF.count() == 6)
  }
}
