package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DataSkippingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("manifest stats prune files the predicate cannot match") {
    val loc = TestSpark.tmpDir("skip")
    val t = new TxTable(spark, loc)
    // three appends with disjoint id ranges -> three file sets with
    // non-overlapping min/max
    t.create((0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1))
    t.append((100L until 200L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1))
    t.append((200L until 300L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1))
    val snap = t.snapshot
    assert(snap.files.size == 3)
    assert(snap.files.forall(f => f.minValues.isDefined && f.maxValues.isDefined))
    assert(snap.files.forall(_.rows == 100))

    assert(t.filesAfterPruning("id >= 250") == 1)
    assert(t.filesAfterPruning("id = 150") == 1)
    assert(t.filesAfterPruning("id < 100") == 1)
    assert(t.filesAfterPruning("id >= 100 AND id < 200") == 1)
    assert(t.filesAfterPruning("id >= 0") == 3)
    // non-prunable predicate keeps everything (conservative)
    assert(t.filesAfterPruning("length(v) > 1") == 3)

    // results are still exact
    assert(t.scan("id >= 250").count() == 50)
    assert(t.scan("id = 150").collect().map(_.getString(1)).toSeq == Seq("v150"))
    assert(t.scan("id >= 100 AND id < 200 AND length(v) >= 2").count() == 100)
  }

  test("null counts prune IS NULL / IS NOT NULL predicates") {
    val loc = TestSpark.tmpDir("skip-null")
    val t = new TxTable(spark, loc)
    // file 1: tag never null; file 2: tag always null; file 3: mixed
    t.create((0L until 100L).map(i => (i, s"t$i")).toDF("id", "tag").repartition(1))
    t.append((100L until 200L).map(i => (i, null: String)).toDF("id", "tag").repartition(1))
    t.append((200L until 300L).map(i => (i, if (i % 2 == 0) s"t$i" else null))
      .toDF("id", "tag").repartition(1))
    val snap = t.snapshot
    assert(snap.files.size == 3)
    assert(snap.files.forall(_.nullCounts.exists(_.contains("tag"))))

    assert(t.filesAfterPruning("tag IS NULL") == 2)     // all-null + mixed
    assert(t.filesAfterPruning("tag IS NOT NULL") == 2) // no-null + mixed
    assert(t.filesAfterPruning("tag IS NULL AND id < 100") == 0)
    assert(t.filesAfterPruning("tag IS NOT NULL AND id >= 100 AND id < 200") == 0)

    // results stay exact
    assert(t.scan("tag IS NULL").count() == 150)
    assert(t.scan("tag IS NOT NULL").count() == 150)

    // the same stats ride the Iceberg manifests round-trip
    val iloc = TestSpark.tmpDir("skip-null-ice") + "/t"
    val ti = TxTable.forIceberg(spark, iloc)
    ti.create((0L until 100L).map(i => (i, s"t$i")).toDF("id", "tag").repartition(1), Seq.empty)
    ti.append((100L until 200L).map(i => (i, null: String)).toDF("id", "tag").repartition(1))
    val isnap = ti.snapshot
    assert(isnap.files.forall(_.nullCounts.exists(_.contains("tag"))))
    assert(ti.filesAfterPruning("tag IS NULL") == 1)
    assert(ti.filesAfterPruning("tag IS NOT NULL") == 1)
    assert(IcebergLog.scan(spark, iloc, "tag IS NULL").count() == 100)
    assert(IcebergLog.filesAfterPruning(spark, iloc, "tag IS NULL") == 1)
  }

  test("string stats prune too") {
    val loc = TestSpark.tmpDir("skip")
    val t = new TxTable(spark, loc)
    t.create(Seq(("alpha", 1L), ("beta", 2L)).toDF("name", "x").repartition(1))
    t.append(Seq(("omega", 3L), ("zeta", 4L)).toDF("name", "x").repartition(1))
    assert(t.filesAfterPruning("name = 'beta'") == 1)
    assert(t.filesAfterPruning("name > 'm'") == 1)
    assert(t.scan("name = 'zeta'").count() == 1)
  }

  test("date and timestamp stats compare as dates, not strings") {
    val loc = TestSpark.tmpDir("skip")
    val t = new TxTable(spark, loc)
    import java.sql.{Date, Timestamp}
    t.create(Seq((Date.valueOf("2024-01-01"), 1L), (Date.valueOf("2024-01-15"), 2L))
      .toDF("d", "x").repartition(1))
    t.append(Seq((Date.valueOf("2024-06-01"), 3L), (Date.valueOf("2024-06-15"), 4L))
      .toDF("d", "x").repartition(1))
    // footer stats are INT32 epoch days; a lexicographic compare against the
    // ISO literal would wrongly prune files that DO contain matches
    assert(t.scan("d = '2024-01-15'").count() == 1)
    assert(t.scan("d >= '2024-06-01'").count() == 2)
    assert(t.scan("d = DATE'2024-06-15'").count() == 1)
    assert(t.filesAfterPruning("d = '2024-01-15'") == 1)
    // DELETE through the same pruner must not silently miss rows
    t.delete("d = '2024-01-01'")
    assert(t.toDF.count() == 3)

    val ts = new TxTable(spark, TestSpark.tmpDir("skip"))
    ts.create(Seq((Timestamp.valueOf("2024-01-01 10:00:00"), 1L)).toDF("ts", "x").repartition(1))
    ts.append(Seq((Timestamp.valueOf("2024-06-01 10:00:00"), 2L)).toDF("ts", "x").repartition(1))
    assert(ts.scan("ts >= '2024-06-01 00:00:00'").count() == 1)
    assert(ts.scan("ts = TIMESTAMP'2024-01-01 10:00:00'").count() == 1)
    assert(ts.filesAfterPruning("ts >= '2024-06-01 00:00:00'") == 1)
  }

  test("timestamp pruning uses the session timezone, not the JVM default") {
    // Literal strings in predicates are evaluated by Spark in
    // spark.sql.session.timeZone (UTC here); footer stats are UTC epoch
    // micros. If the pruner parsed literals in the JVM default zone instead,
    // shifting that zone would silently prune files that DO contain matches.
    val t = new TxTable(spark, TestSpark.tmpDir("skiptz"))
    t.create(spark.sql("select timestamp'2024-01-01 10:00:00' as ts, 1L as x").repartition(1))
    t.append(spark.sql("select timestamp'2024-06-01 10:00:00' as ts, 2L as x").repartition(1))

    val saved = java.util.TimeZone.getDefault
    try {
      // +14:00 — the largest possible skew from UTC
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Pacific/Kiritimati"))
      assert(t.scan("ts = '2024-06-01 10:00:00'").count() == 1)
      assert(t.scan("ts >= '2024-06-01 05:00:00'").count() == 1)
      assert(t.filesAfterPruning("ts = '2024-01-01 10:00:00'") == 1)
      // DELETE goes through the same pruner — must not miss its file
      t.delete("ts = '2024-01-01 10:00:00'")
      assert(t.toDF.count() == 1)

      // and a -07:00 JVM zone must not over-prune the other direction
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/Los_Angeles"))
      assert(t.scan("ts >= '2024-06-01 05:00:00'").count() == 1)
    } finally java.util.TimeZone.setDefault(saved)
  }

  test("optimize compacts many small files into few, preserving data") {
    val loc = TestSpark.tmpDir("opt")
    val t = new TxTable(spark, loc)
    t.create((0L until 50L).map(i => (i, i * 2)).toDF("id", "v").repartition(1))
    (1 to 9).foreach { k =>
      t.append((k * 50L until (k + 1) * 50L).map(i => (i, i * 2)).toDF("id", "v").repartition(1))
    }
    val before = t.snapshot
    assert(before.files.size == 10)
    val checksum = t.toDF.agg(sum(col("id")), sum(col("v"))).collect()(0)

    t.optimize(targetFileBytes = 1024L * 1024 * 1024) // everything into one file
    val after = t.snapshot
    assert(after.files.size == 1)
    assert(t.toDF.count() == 500)
    val checksum2 = t.toDF.agg(sum(col("id")), sum(col("v"))).collect()(0)
    assert(checksum == checksum2)
    // old versions still time-travelable before vacuum
    assert(t.toDF(before.version).count() == 500)
  }

  test("checkpoint written every 10 commits; snapshot replays from it correctly") {
    val loc = TestSpark.tmpDir("ckpt")
    val t = new TxTable(spark, loc)
    t.create(Seq((0L, 0L)).toDF("id", "v").repartition(1))
    (1 to 12).foreach { k =>
      t.append(Seq((k.toLong, k.toLong)).toDF("id", "v").repartition(1))
    }
    // commits 0..12 -> checkpoint at version 10
    val logFiles = new java.io.File(s"$loc/_graft_log").list().toSeq
    assert(logFiles.exists(_.endsWith("00000000000000000010.checkpoint.json")), logFiles.sorted)
    // snapshot (checkpoint + 2-commit tail) sees all 13 rows
    assert(t.toDF.count() == 13)
    assert(t.version == 12L)
    // time travel before the checkpoint still works (full replay path)
    assert(t.toDF(5L).count() == 6)
    // and data skipping stats still present after checkpoint round-trip
    assert(t.filesAfterPruning("id = 12") == 1)
  }

  test("concurrent appends both land via optimistic retry") {
    val loc = TestSpark.tmpDir("conc")
    val t = new TxTable(spark, loc)
    t.create(Seq((0L, "base")).toDF("id", "v").repartition(1))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (1 to 4).map { k =>
      Future {
        new TxTable(spark, loc).append(
          Seq((k.toLong, s"writer$k")).toDF("id", "v").repartition(1))
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    // all five rows present, log has 5 commits (create + 4 appends)
    assert(t.toDF.count() == 5)
    assert(t.version == 4L)
    assert(t.toDF.select("v").collect().map(_.getString(0)).toSet ==
      Set("base", "writer1", "writer2", "writer3", "writer4"))
  }

  test("vacuum removes unreferenced files; time travel to old versions breaks") {
    val loc = TestSpark.tmpDir("vac")
    val t = new TxTable(spark, loc)
    t.create((0L until 10L).map(i => (i, i)).toDF("id", "v").repartition(1))
    t.overwrite((10L until 20L).map(i => (i, i)).toDF("id", "v").repartition(1))
    t.overwrite((20L until 30L).map(i => (i, i)).toDF("id", "v").repartition(1))

    val deleted = t.vacuum(retainVersions = 1, retentionMs = 0L, force = true)
    assert(deleted == 2, s"expected the two overwritten files deleted, got $deleted")
    // current version unaffected
    assert(t.toDF.agg(min(col("id")), max(col("id"))).collect()(0).toSeq == Seq(20L, 29L))
    // old version's files are gone
    intercept[Exception] { t.toDF(0L).count() }
  }

  test("OPTIMIZE ZORDER: multi-column rectangle predicates prune most files") {
    val loc = TestSpark.tmpDir("zorder")
    val t = new TxTable(spark, loc)
    // 256x256 grid in random row order -> every file spans both dimensions
    val grid = (0 until 65536).map { i =>
      val shuffled = (i * 2654435761L) % 65536
      (shuffled % 256, shuffled / 256, i.toLong)
    }.toDF("a", "b", "id").repartition(16)
    t.create(grid)
    val rect = "a >= 0 AND a <= 63 AND b >= 0 AND b <= 63"
    val before = t.filesAfterPruning(rect)
    assert(before >= 12, s"random layout should leave most of 16 files unprunable, got $before")

    t.optimizeZOrder(Seq("a", "b"), targetFileBytes = 64L * 1024)
    val nFiles = t.snapshot.files.size
    val after = t.filesAfterPruning(rect)
    assert(t.toDF.filter(rect).count() == 64L * 64L) // data intact
    assert(after <= math.max(2, nFiles / 4),
      s"z-ordered layout should prune the 1/16 rectangle to a few of $nFiles files, got $after")
  }
}
