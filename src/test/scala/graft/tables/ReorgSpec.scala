package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** REORG TABLE ... APPLY (PURGE): the deferred physical rewrite behind
  * merge-on-read. DELETE/UPDATE on DV-enabled Delta (and position-delete
  * Iceberg) commit bitmaps, not rewrites — PURGE materializes the
  * survivors for exactly the files carrying deletes, leaving clean files
  * untouched, so its cost is O(files-with-deletes) not O(table).
  */
class ReorgSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample: DataFrame =
    (0 until 100).map(i => (i.toLong, s"s$i", i % 7)).toDF("id", "s", "grp")

  test("purge rewrites only DV-carrying files; clean files survive untouched") {
    val loc = TestSpark.tmpDir("reorg")
    DeltaLogWriter.create(spark, loc, sample.repartition(4, col("id")),
      properties = Map("delta.enableDeletionVectors" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.delete("id < 10") // DVs land on the subset of files holding id<10
    val before = t.snapshot
    val dirty = before.files.filter(_.deletionVector.exists(_.cardinality > 0))
    val clean = before.files.filterNot(_.deletionVector.exists(_.cardinality > 0))
    assert(dirty.nonEmpty, "fixture must place DVs on some files")

    assert(t.reorgPurge())
    val after = t.snapshot
    // no file carries a DV any more, and logical content is unchanged
    assert(after.files.forall(!_.deletionVector.exists(_.cardinality > 0)))
    assert(t.toDF.count() === 90L)
    assert(t.toDF.agg(sum("id")).as[Long].head() === (10L until 100L).sum)
    // untouched clean files keep their identity; dirty paths are gone
    val afterPaths = after.files.map(_.path).toSet
    assert(clean.forall(f => afterPaths.contains(f.path)))
    assert(dirty.forall(f => !afterPaths.contains(f.path)))
    // physical row counts now match live rows (deleted rows gone from disk)
    assert(after.files.map(_.rows).sum === 90L)

    // nothing left to purge: second call is a no-op, no commit published
    val v = t.version
    assert(!t.reorgPurge())
    assert(t.version === v)
  }

  test("purge drops fully-deleted files without reading them") {
    val loc = TestSpark.tmpDir("reorg-full")
    // one file per grp value; grp=3 will be deleted wholesale
    DeltaLogWriter.create(spark, loc, sample, partitionColumns = Seq("grp"),
      properties = Map("delta.enableDeletionVectors" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.delete("grp = 3")
    t.delete("grp = 5 AND id < 30")
    assert(t.reorgPurge())
    val after = t.snapshot
    assert(after.files.forall(!_.deletionVector.exists(_.cardinality > 0)))
    assert(after.files.forall(f => f.partitionValues.get("grp") != Some("3")))
    assert(t.toDF.count() === sample.filter(!(col("grp") === 3) &&
      !(col("grp") === 5 && col("id") < 30)).count())
  }

  test("purge is dataChange=false: CDF and streaming skip it, row ids survive") {
    val loc = TestSpark.tmpDir("reorg-cdf")
    DeltaLogWriter.create(spark, loc, sample.repartition(2),
      properties = Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true",
        "delta.enableRowTracking" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    // pin each surviving row's id before the purge
    val idsBefore = DeltaLog.toDFWithRowIds(spark, loc)
      .filter(col("id") >= 10)
      .select(col("id"), col(RowTracking.RowIdCol))
      .as[(Long, Long)].collect().toMap
    t.delete("id < 10")
    val vDelete = t.version
    assert(t.reorgPurge())
    // the purge's adds must NOT re-enter change feeds / streams
    assert(t.changesSince(vDelete).count() === 0L)
    assert(t.appendOnlySince(vDelete))
    // row ids are preserved through the rewrite
    val idsAfter = DeltaLog.toDFWithRowIds(spark, loc)
      .select(col("id"), col(RowTracking.RowIdCol))
      .as[(Long, Long)].collect().toMap
    assert(idsAfter === idsBefore)
  }

  test("purge on an Iceberg table folds position deletes away") {
    val loc = TestSpark.tmpDir("reorg-ice") + "/t"
    val t = TxTable.forIceberg(spark, loc)
    t.create(sample.repartition(4, col("id")))
    t.delete("id % 10 = 7")
    val before = t.snapshot
    assert(before.files.exists(_.deletionVector.exists(_.cardinality > 0)))
    assert(t.reorgPurge())
    val after = t.snapshot
    assert(after.files.forall(!_.deletionVector.exists(_.cardinality > 0)))
    assert(t.toDF.count() === 90L)
    assert(t.toDF.agg(sum("id")).as[Long].head() ===
      (0L until 100L).filterNot(_ % 10 == 7).sum)
    // direct Iceberg read path agrees (dangling delete files are ignored)
    assert(IcebergLog.toDF(spark, loc).count() === 90L)
    // streaming/appendOnly consumers treat the purge as a non-data commit
    assert(IcebergCommitLog.appendOnlyBetween(spark, loc,
      t.version - 1, Some(t.version)))
  }

  test("a concurrent MoR delete racing the purge is never lost") {
    // REORG plans against a snapshot and commits optimistically; a DV
    // delete landing in between bumps the version, the purge's CAS
    // fails, and commitWithRetryIf REPLANS against the fresh snapshot —
    // so the delete's bitmaps are either purged too (replan saw them)
    // or still present (delete landed after the purge won). Both end
    // states must show the delete applied; a second purge then leaves
    // zero DVs. Run the race several times — any interleaving must
    // satisfy the invariants.
    for (round <- 0 until 3) {
      val loc = TestSpark.tmpDir(s"reorg-race-$round")
      DeltaLogWriter.create(spark, loc,
        (0 until 400).map(i => (i.toLong, s"s$i")).toDF("id", "s").repartition(8),
        properties = Map("delta.enableDeletionVectors" -> "true"))
      val t = TxTable.forForeignDelta(spark, loc)
      t.delete("id < 40") // seed DVs so the purge has work
      val deleter = new Thread(() =>
        TxTable.forForeignDelta(spark, loc).delete("id >= 360"))
      val purger = new Thread(() =>
        TxTable.forForeignDelta(spark, loc).reorgPurge())
      deleter.start(); purger.start()
      deleter.join(120000); purger.join(120000)
      // both effects applied, whatever the interleaving
      assert(t.toDF.count() === 320L,
        s"round $round: content wrong after race")
      assert(t.toDF.agg(min(col("id")), max(col("id"))).as[(Long, Long)].head() ===
        ((40L, 359L)))
      // a final purge settles any bitmaps the late delete left
      t.reorgPurge()
      val snap = t.snapshot
      assert(snap.files.forall(!_.deletionVector.exists(_.cardinality > 0)))
      assert(snap.files.map(_.rows).sum === 320L)
    }
  }

  test("GENERATE symlink_format_manifest: partition-scoped file lists, DV refusal") {
    val loc = TestSpark.tmpDir("symlink")
    DeltaLogWriter.create(spark, loc, sample, partitionColumns = Seq("grp"),
      properties = Map("delta.enableDeletionVectors" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    val n = t.generateSymlinkManifest()
    assert(n === 7, "one manifest per grp partition")
    // each manifest lists exactly that partition's live files as URIs
    val snap = t.snapshot
    val m3 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      loc, "_symlink_format_manifest", "grp=3", "manifest")).trim.split("\n").toSet
    val expected = snap.files.filter(_.partitionValues("grp") == "3")
      .map(a => TxLog.fs(spark, loc).makeQualified(
        new org.apache.hadoop.fs.Path(TxLog.resolve(loc, a.path))).toUri.toString).toSet
    assert(m3 === expected)
    // the manifest paths are readable parquet covering the partition
    assert(spark.read.parquet(m3.toSeq: _*).count() ===
      sample.filter(col("grp") === 3).count())

    // a MoR delete leaves DVs -> refuse (symlink readers would resurrect)
    t.delete("id < 10")
    intercept[graft.catalog.UnsupportedOperationError](t.generateSymlinkManifest())
    // after the purge, regeneration drops stale manifests
    assert(t.reorgPurge())
    val n2 = t.generateSymlinkManifest()
    assert(n2 <= 7)
    val root = new java.io.File(s"$loc/_symlink_format_manifest")
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === t.snapshot.files.map(a => s"grp=${a.partitionValues("grp")}").toSet)

    // SQL surface on a catalog name
    val client = new graft.client.LakehouseClient(spark)
    client.createCatalog("gen1")
    client.createSchema("gen1", "s")
    client.registerAsTable("gen1", "s", "t", graft.catalog.FileType.DELTA, loc)
    val written = spark.sql("GENERATE symlink_format_manifest FOR TABLE gen1.s.t")
      .collect()(0).getInt(0)
    assert(written === n2)
  }

  test("symlink manifests distribute above the driver-loop tuple threshold") {
    // ~500 partition tuples > SymlinkDriverMaxTuples → the executor path
    // writes them; content contract identical to the driver loop
    val loc = TestSpark.tmpDir("symlink-many")
    val many = spark.range(500).selectExpr("id", "cast(id as string) AS grp")
    val t = new TxTable(spark, loc)
    t.create(many, partitionColumns = Seq("grp"))
    val n = t.generateSymlinkManifest()
    assert(n === 500)
    val snap = t.snapshot
    // spot-check a partition's manifest lists exactly its live files
    val m = java.nio.file.Files.readString(java.nio.file.Paths.get(
      loc, "_symlink_format_manifest", "grp=371", "manifest")).trim.split("\n").toSet
    val expected = snap.files.filter(_.partitionValues("grp") == "371")
      .map(a => TxLog.fs(spark, loc).makeQualified(
        new org.apache.hadoop.fs.Path(TxLog.resolve(loc, a.path))).toUri.toString).toSet
    assert(m === expected && m.nonEmpty)
    // every tuple got a manifest dir
    val root = new java.io.File(s"$loc/_symlink_format_manifest")
    assert(root.listFiles().count(_.isDirectory) === 500)
  }

  test("purge on a table without deletes is a no-op on all backends") {
    val locD = TestSpark.tmpDir("reorg-noop")
    DeltaLogWriter.create(spark, locD, sample)
    assert(!TxTable.forForeignDelta(spark, locD).reorgPurge())
    val locN = TestSpark.tmpDir("reorg-noop-native")
    val tn = TxTable.forLocation(spark, locN)
    tn.create(sample)
    assert(!tn.reorgPurge())
  }
}
