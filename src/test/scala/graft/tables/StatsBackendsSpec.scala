package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The column-stats stamp must behave identically on ALL THREE commit
  * logs — native, real _delta_log, Iceberg: analyze, serve, fold on
  * append, fold a provable copy-on-write delete (SUM subtracts, ties
  * drop extremes, sketches honestly invalidate), go stale on anything
  * unprovable (UPDATE, merge-on-read deletes).
  */
class StatsBackendsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def roundTrip(t: TxTable): Unit = {
    val df = (0 until 500).map(i => (i.toLong, s"v${i % 40}")).toDF("id", "v")
    t.create(df)
    val ndv = ColumnStats.analyze(t, Seq("id", "v")).toMap
    assert(ndv == Map("id" -> 500L, "v" -> 40L))
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentSum(t.snapshot, "id").contains(Some((0L until 500L).sum)))
    // fold on append
    t.append(Seq((1000L, "v_new")).toDF("id", "v"))
    assert(ColumnStats.isFresh(t.snapshot), "fold must keep the stamp fresh")
    assert(ColumnStats.currentNdv(t.snapshot, "id").contains(501L))
    assert(ColumnStats.currentNdv(t.snapshot, "v").contains(41L))
    assert(ColumnStats.currentSum(t.snapshot, "id")
      .contains(Some((0L until 500L).sum + 1000L)))
    assert(ColumnStats.currentMinMax(t.snapshot, "v", isMin = false)
      .get.get.toString == "v_new")
    // a provable copy-on-write DELETE folds: SUM subtracts, the
    // sketch honestly drops (it cannot un-see a value), interior
    // extremes survive
    t.delete("id = 250") // removes (250, "v10") — interior on both columns
    assert(ColumnStats.isFresh(t.snapshot), "provable delete must fold, not kill")
    assert(ColumnStats.currentNdv(t.snapshot, "id").isEmpty,
      "NDV cannot fold a removal")
    assert(ColumnStats.currentSum(t.snapshot, "id")
      .contains(Some((0L until 500L).sum + 1000L - 250L)))
    assert(ColumnStats.currentMinMax(t.snapshot, "v", isMin = false)
      .get.get.toString == "v_new", "non-tied extremes survive the delete fold")
    // a delete that TIES an extreme drops that column's pair (the
    // holder may be gone), while the rest keeps folding
    t.delete("id = 0") // ties MIN(id) and MIN(v)="v0"
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentMinMax(t.snapshot, "id", isMin = true).isEmpty)
    assert(ColumnStats.currentSum(t.snapshot, "id")
      .contains(Some((0L until 500L).sum + 1000L - 250L)))
    // a CoW UPDATE folds (round 14): the assigned column's stats are
    // honestly unset (its value delta is never derivable), but the
    // rewrite is row-preserving so every OTHER column's stats survive
    t.update("id = 5", Map("v" -> "'zz'"))
    assert(ColumnStats.isFresh(t.snapshot),
      "an update must fold the unassigned columns, not kill the stamp")
    assert(ColumnStats.currentNdv(t.snapshot, "v").isEmpty,
      "the assigned column's stats must unset")
    assert(ColumnStats.currentMinMax(t.snapshot, "v", isMin = false).isEmpty)
    assert(ColumnStats.currentSum(t.snapshot, "id")
      .contains(Some((0L until 500L).sum + 1000L - 250L)),
      "unassigned columns' stats must survive the update")
    // a matched rewrite that is NOT an update (overwrite) still kills
    t.overwrite(Seq((1L, "x")).toDF("id", "v"))
    assert(!ColumnStats.isFresh(t.snapshot))
  }

  test("native log") {
    roundTrip(new TxTable(spark, TestSpark.tmpDir("statsb-native") + "/t"))
  }

  test("foreign real _delta_log") {
    val loc = TestSpark.tmpDir("statsb-delta") + "/t"
    val df0 = Seq.empty[(Long, String)].toDF("id", "v")
    DeltaLogWriter.create(spark, loc, df0.limit(0))
    val t = TxTable.forForeignDelta(spark, loc)
    // create() refuses an existing log; drive the same flow via append
    val df = (0 until 500).map(i => (i.toLong, s"v${i % 40}")).toDF("id", "v")
    t.append(df)
    val ndv = ColumnStats.analyze(t, Seq("id", "v")).toMap
    assert(ndv == Map("id" -> 500L, "v" -> 40L))
    t.append(Seq((1000L, "v_new")).toDF("id", "v"))
    assert(ColumnStats.isFresh(t.snapshot), "fold must keep a foreign-Delta stamp fresh")
    assert(ColumnStats.currentNdv(t.snapshot, "v").contains(41L))
    // CoW delete on a foreign log folds the same way
    t.delete("id = 0")
    assert(ColumnStats.isFresh(t.snapshot), "foreign CoW delete must fold")
    assert(ColumnStats.currentSum(t.snapshot, "id")
      .contains(Some((0L until 500L).sum + 1000L)))
    assert(ColumnStats.currentNdv(t.snapshot, "id").isEmpty)
  }

  test("foreign _delta_log with DELETION VECTORS: merge-on-read delete folds too") {
    val loc = TestSpark.tmpDir("statsb-dv") + "/t"
    val df = (0 until 500).map(i => (i.toLong, s"v${i % 40}")).toDF("id", "v")
    DeltaLogWriter.create(spark, loc, df,
      properties = Map("delta.enableDeletionVectors" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    ColumnStats.analyze(t, Seq("id", "v"))
    // the DV delete marks bits instead of rewriting — the fold rides
    // the SAME pinned commit (base+1), so the maintenance story holds
    // on the modern merge-on-read default too
    t.delete("id = 250")
    assert(t.snapshot.files.exists(_.deletionVector.exists(_.cardinality > 0)),
      "fixture must actually be merge-on-read")
    assert(ColumnStats.isFresh(t.snapshot), "DV delete must fold, not kill")
    assert(ColumnStats.currentSum(t.snapshot, "id")
      .contains(Some((0L until 500L).sum - 250L)))
    assert(ColumnStats.currentNdv(t.snapshot, "id").isEmpty,
      "NDV cannot fold a removal")
    assert(ColumnStats.currentMinMax(t.snapshot, "id", isMin = true)
      .get.contains(0L), "untied extremes survive the DV fold")
    // tie -> pair drops, stamp stays fresh
    t.delete("id = 0")
    assert(ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentMinMax(t.snapshot, "id", isMin = true).isEmpty)
    // a DV UPDATE folds too (round 14): the marked rows come back 1:1
    // in the appended file set, so only the assigned column's stats
    // unset and the rest stays servable
    t.update("id = 5", Map("v" -> "'zz'"))
    assert(ColumnStats.isFresh(t.snapshot),
      "a MoR update must fold the unassigned columns")
    assert(ColumnStats.currentNdv(t.snapshot, "v").isEmpty)
    assert(ColumnStats.currentSum(t.snapshot, "id").isDefined,
      "the unassigned column's sum must survive the DV update")
  }

  test("iceberg log") {
    val loc = TestSpark.tmpDir("statsb-ice") + "/t"
    val df = (0 until 500).map(i => (i.toLong, s"v${i % 40}")).toDF("id", "v")
    IcebergWriter.create(spark, loc, df)
    val t = TxTable.forIceberg(spark, loc)
    val ndv = ColumnStats.analyze(t, Seq("id", "v")).toMap
    assert(ndv == Map("id" -> 500L, "v" -> 40L))
    t.append(Seq((1000L, "v_new")).toDF("id", "v"))
    assert(ColumnStats.isFresh(t.snapshot), "fold must keep an Iceberg stamp fresh")
    assert(ColumnStats.currentNdv(t.snapshot, "v").contains(41L))
    // Iceberg deletes are merge-on-read (a position-delete snapshot,
    // not a CoW rewrite) — since round 15 they FOLD like the Delta DV
    // path: SUM subtracts exactly, sketches honestly unset
    t.delete("id = 0")
    assert(ColumnStats.isFresh(t.snapshot),
      "a MoR position delete must fold the stamp")
    assert(ColumnStats.currentSum(t.snapshot, "id")
      .contains(Some((1L until 500L).sum + 1000L)))
    assert(ColumnStats.currentNdv(t.snapshot, "id").isEmpty,
      "a sketch cannot un-see the removed value")
  }

  test("iceberg whole-partition delete: metadata-only removal, stats fold through") {
    val loc = TestSpark.tmpDir("statsb-icedrop") + "/t"
    val df = (0 until 300).map(i => (i.toLong, s"p${i % 3}", (i % 50).toLong))
      .toDF("id", "p", "k")
    IcebergWriter.create(spark, loc, df.repartition(2), partitionColumns = Seq("p"))
    val t = TxTable.forIceberg(spark, loc)
    ColumnStats.analyze(t, Seq("id", "k", "p"))
    val filesBefore = t.snapshot.files.size
    // the retention shape: a partition-only predicate decides every
    // file, so the matching files REMOVE in one pinned metadata commit
    // — no position-delete file is written, and the stamp folds
    t.delete("p = 'p1'")
    val snap = t.snapshot
    assert(snap.files.size < filesBefore, "files must drop from the manifest")
    assert(!snap.files.exists(_.deletionVector.isDefined),
      "no position-delete file may be written by the fast path")
    assert(ColumnStats.isFresh(snap), "the Iceberg partition drop must fold")
    assert(ColumnStats.currentSum(snap, "id").contains(Some(
      (0L until 300L).filterNot(_ % 3 == 1).sum)))
    assert(ColumnStats.currentPartitionTuples(snap).get.toSet ==
      Set(Seq("p0"), Seq("p2")))
    assert(t.toDF.count() == 200L)
    // an undecidable (non-partition) predicate falls back to the MoR
    // position-delete path — which now FOLDS too (pinned at
    // metadataVersion+1): SUM subtracts the hidden rows exactly
    t.delete("k = 7")
    assert(t.snapshot.files.exists(_.deletionVector.isDefined),
      "the MoR path must still write position deletes")
    assert(ColumnStats.isFresh(t.snapshot),
      "the MoR position delete must fold the stamp")
    assert(ColumnStats.currentSum(t.snapshot, "id").contains(Some(
      (0L until 300L).filterNot(i => i % 3 == 1 || i % 50 == 7).sum)))
    assert(t.toDF.filter("k = 7").count() == 0L)
  }

  test("iceberg whole-partition delete stays metadata-only WITH a null partition") {
    // the manifest reader used to DROP a null identity partition value
    // from partitionValues (instead of surfacing colName -> null), so a
    // null-partition file was undecidable to the partition-predicate
    // evaluator and every whole-partition DELETE on such a table
    // silently degraded to merge-on-read — and the per-partition stats
    // layer's keeps all bailed on the None tuple
    val loc = TestSpark.tmpDir("statsb-icenull") + "/t"
    val df = (0 until 300).map(i =>
      (i.toLong, if (i % 4 == 3) null else s"p${i % 3}", (i % 50).toLong))
      .toDF("id", "p", "k")
    IcebergWriter.create(spark, loc, df.repartition(2), partitionColumns = Seq("p"))
    val t = TxTable.forIceberg(spark, loc)
    assert(t.snapshot.files.exists(_.partitionValues.get("p").contains(null)),
      "a null partition must read back as p -> null, not as a missing key")
    ColumnStats.analyze(t, Seq("id", "k"))
    t.delete("p = 'p1'")
    val snap = t.snapshot
    assert(!snap.files.exists(_.deletionVector.isDefined),
      "the whole-partition drop must stay metadata-only despite the null partition")
    assert(ColumnStats.isFresh(snap), "the drop must fold")
    val live = (0 until 300).filterNot(i => i % 4 != 3 && i % 3 == 1)
    assert(ColumnStats.currentSum(snap, "id").contains(Some(live.map(_.toLong).sum)))
    assert(t.toDF.count() == live.size.toLong)
    // the layer survived the drop (null tuple listed, p1 delisted)
    assert(ColumnStats.currentPartitionTuples(snap).get.toSet ==
      Set(Seq("p0"), Seq("p2"), Seq(null)))
    // and SQL NULL-partition rows are still readable and correct
    assert(t.toDF.filter("p IS NULL").count() ==
      (0 until 300).count(_ % 4 == 3).toLong)
  }
}
