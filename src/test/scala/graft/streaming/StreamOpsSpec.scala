package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.TxTable

class StreamOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // base offset keeps the first event strictly above the initial watermark
  // (epoch 0), which stateful ops treat as late and drop
  private def ts(minute: Int): Timestamp = new Timestamp(86400000L + minute * 60L * 1000L)

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double, Timestamp)]
    val events = input.toDF().toDF("user_id", "event_type", "value", "event_time")
    val agg = StreamOps.windowedCounts(events, windowLen = "10 minutes", lateness = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      input.addData((1L, "click", 1.0, ts(1)), (1L, "click", 2.0, ts(4)), (2L, "view", 5.0, ts(12)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events, total_value FROM wc ORDER BY event_type").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionize closes sessions on inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double, Timestamp)]
    val events = input.toDF().toDF("user_id", "event_type", "value", "event_time")
    val sessions = StreamOps.sessionize(spark, events, gapMinutes = 10)
    val q = sessions.writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: two events close together, then a long gap, then another event
      input.addData((1L, "a", 1.0, ts(0)), (1L, "b", 2.0, ts(5)))
      q.processAllAvailable()
      input.addData((1L, "c", 3.0, ts(60))) // 55-min gap -> closes session 1
      q.processAllAvailable()
      input.addData((1L, "d", 4.0, ts(120))) // advance watermark far enough to time out session 2
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, total_value FROM sess ORDER BY session_start").collect()
      assert(rows.nonEmpty)
      assert(rows(0).getLong(0) == 1L)
      assert(rows(0).getLong(1) == 2L) // first session had 2 events
      assert(rows(0).getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("streaming dedup drops repeated keys within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val events = input.toDF().toDF("doc_id", "content_hash", "event_time")
    val deduped = StreamOps.deduplicateStream(events, Seq("content_hash"), horizon = "30 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData((1L, "h1", ts(1)), (2L, "h2", ts(2)), (3L, "h1", ts(3))) // h1 duplicated
      q.processAllAvailable()
      input.addData((4L, "h1", ts(5)), (5L, "h3", ts(6))) // h1 again within horizon
      q.processAllAvailable()
      val hashes = spark.sql("SELECT content_hash FROM dedup").collect().map(_.getString(0))
      assert(hashes.sorted.toSeq == Seq("h1", "h2", "h3"), hashes.mkString(","))
    } finally q.stop()
  }

  test("file stream -> transactional table sink via foreachBatch") {
    import spark.implicits._
    val srcDir = TestSpark.tmpDir("stream-src")
    val tblDir = TestSpark.tmpDir("stream-tbl") + "/t"
    val ckpt = TestSpark.tmpDir("stream-ckpt")

    // two parquet drops in the events shape (ns timestamps)
    val batch1 = Seq((1L, 1000000000L * 60, 10L, "click", 1.0, "{}"),
      (2L, 1000000000L * 120, 10L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch1.write.parquet(srcDir + "/b1")

    val stream = StreamOps.eventFileStream(spark, srcDir + "/*")
      .select("event_id", "user_id", "event_type", "value", "event_time")
    val q = StreamOps.writeToTxTable(stream, tblDir, ckpt, Trigger.AvailableNow())
    q.awaitTermination(60000)

    val t = TxTable.forLocation(spark, tblDir)
    assert(t.toDF.count() == 2)
    assert(t.toDF.select("event_type").orderBy("event_id").collect().map(_.getString(0)).toSeq ==
      Seq("click", "view"))
  }

  test("TxTableSource: readStream over the transaction log delivers commits as micro-batches") {
    import spark.implicits._
    val loc = TestSpark.tmpDir("txsrc") + "/t"
    val ckpt = TestSpark.tmpDir("txsrc-ckpt")
    val t = new TxTable(spark, loc)
    t.create(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))   // v0
    t.append(Seq((3L, "c")).toDF("id", "s"))              // v1

    val received = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def runAvailable(): Unit = {
      val stream = spark.readStream
        .format("graft.streaming.TxTableSourceProvider")
        .load(loc)
      val q = stream.writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id", "_commit_version").collect()
            .foreach(r => received.add((r.getLong(0), r.getLong(1))))
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }

    runAvailable()
    import scala.jdk.CollectionConverters._
    assert(received.asScala.toSeq.sorted == Seq((1L, 0L), (2L, 0L), (3L, 1L)))

    // new commit, resume from the streaming checkpoint: only v2 arrives
    t.append(Seq((4L, "d")).toDF("id", "s"))              // v2
    received.clear()
    runAvailable()
    assert(received.asScala.toSeq.sorted == Seq((4L, 2L)))
  }

  test("TxTableSource streams a REAL Delta (_delta_log) table via log dispatch") {
    import spark.implicits._
    val loc = TestSpark.tmpDir("txsrc-delta") + "/t"
    val ckpt = TestSpark.tmpDir("txsrc-delta-ckpt")
    graft.tables.DeltaLogWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s")) // v0
    graft.tables.DeltaLogWriter.append(spark, loc, Seq((2L, "b")).toDF("id", "s")) // v1

    val received = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def runAvailable(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.TxTableSourceProvider")
        .load(loc)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id", "_commit_version").collect()
            .foreach(r => received.add((r.getLong(0), r.getLong(1))))
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }

    runAvailable()
    import scala.jdk.CollectionConverters._
    assert(received.asScala.toSeq.sorted == Seq((1L, 0L), (2L, 1L)))

    // resume picks up only the new Delta commit
    graft.tables.DeltaLogWriter.append(spark, loc, Seq((3L, "c")).toDF("id", "s")) // v2
    received.clear()
    runAvailable()
    assert(received.asScala.toSeq.sorted == Seq((3L, 2L)))
  }

  test("TxIncremental: durable cursor delivers each commit exactly once across batches") {
    import spark.implicits._
    val loc = TestSpark.tmpDir("txinc") + "/t"
    val ckpt = TestSpark.tmpDir("txinc-ckpt")
    val t = new TxTable(spark, loc)
    t.create(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))       // v0
    t.append(Seq((3L, "c")).toDF("id", "s"))                  // v1

    var seen = Seq.empty[(Long, Long)] // (id, commit_version)
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      seen ++= df.select("id", "_commit_version").collect().map(r => (r.getLong(0), r.getLong(1)))

    // first batch: everything from the beginning (v0 + v1)
    assert(TxIncremental.processAvailable(t, ckpt)(consume) == 2)
    assert(seen.sorted == Seq((1L, 0L), (2L, 0L), (3L, 1L)))
    // nothing new -> function not called
    assert(TxIncremental.processAvailable(t, ckpt)(_ => fail("should not run")) == 0)
    // new commit -> only its rows delivered
    t.append(Seq((4L, "d")).toDF("id", "s"))                  // v2
    seen = Seq.empty
    assert(TxIncremental.processAvailable(t, ckpt)(consume) == 1)
    assert(seen == Seq((4L, 2L)))
    assert(TxIncremental.lastProcessedVersion(t, ckpt) == 2L)
  }
}
