package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.UnsupportedOperationError

/** Row tracking: appends allocate disjoint fresh-row-id ranges above the
  * rowIdHighWaterMark (advanced via domainMetadata in the same commit),
  * reads materialize `_row_id`/`_row_commit_version` from baseRowId +
  * parquet row position, and rewrites are refused (no materialization).
  */
class RowTrackingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkTable(loc: String): TxTable = {
    DeltaLogWriter.create(spark, loc, Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      properties = Map(RowTracking.EnableProp -> "true"))
    TxTable.forForeignDelta(spark, loc)
  }

  test("a table born with row tracking declares writer v7 + the features") {
    val loc = TestSpark.tmpDir("rt-proto") + "/t"
    mkTable(loc)
    val (state, _) = DeltaLog.replayState(spark, loc, None)
    // the advisor's round-5 finding: without this declaration an external
    // writer satisfying writerVersion 2 could legally append without
    // stamping ids or advancing the watermark
    assert(state.minWriter == 7, s"minWriter=${state.minWriter}")
    assert(state.writerFeatures.contains("rowTracking") &&
      state.writerFeatures.contains("domainMetadata"), state.writerFeatures.toString)
  }

  test("appends allocate disjoint id ranges; ids and commit versions read back") {
    val loc = TestSpark.tmpDir("rt") + "/t"
    val t = mkTable(loc)
    t.append(Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "s"))
    t.append(Seq((6L, "f")).toDF("id", "s"))

    val snap = DeltaLog.snapshot(spark, loc)
    // every add carries a base id; ranges [base, base+rows) are disjoint
    val ranges = snap.files.filter(_.baseRowId.isDefined)
      .map(a => (a.baseRowId.get, a.baseRowId.get + a.rows)).sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping ranges $ranges")
      case _ =>
    }
    // the watermark covers the top of the highest range
    val hwm = RowTracking.highWaterMark(DeltaLog.replayState(spark, loc, None)._1.domains)
    assert(hwm == ranges.map(_._2).max - 1, s"hwm=$hwm ranges=$ranges")

    val withIds = DeltaLog.toDFWithRowIds(spark, loc)
    val ids = withIds.select("_row_id").collect().map(_.getLong(0)).sorted
    assert(ids.length == 6 && ids.distinct.length == 6, ids.mkString(","))
    // version-0 files carry no ids (created before the first tracked
    // append)? No: create committed with the property on, so v0 stamped
    // too — every row id is >= 0 and commit versions are sane
    val cvs = withIds.select("_row_commit_version").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(cvs.forall(_ >= 0L), cvs.mkString(","))
  }

  /** (id -> (_row_id, _row_commit_version)) of the current table state. */
  private def idsOf(loc: String): Map[Long, (Long, Long)] =
    DeltaLog.toDFWithRowIds(spark, loc)
      .select("id", "_row_id", "_row_commit_version").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("DELETE rewrite materializes surviving rows' ids (copy-on-write)") {
    val loc = TestSpark.tmpDir("rt-del") + "/t"
    val t = mkTable(loc)
    t.append(Seq((3L, "c"), (4L, "d")).toDF("id", "s"))
    val before = idsOf(loc)
    t.delete("id = 3")
    val after = idsOf(loc)
    assert(after.keySet == Set(1L, 2L, 4L))
    // survivors keep BOTH id and commit version (their content is
    // untouched; the file move is physical, not logical)
    after.foreach { case (k, v) => assert(before(k) == v, s"id $k: ${before(k)} -> $v") }
    // the materialized column names were minted and published
    val props = DeltaLog.snapshot(spark, loc).properties
    assert(props.contains(RowTracking.MaterializedRowIdProp), props.toString)
  }

  test("UPDATE keeps the row id but refreshes the commit version") {
    val loc = TestSpark.tmpDir("rt-upd") + "/t"
    val t = mkTable(loc)
    val before = idsOf(loc)
    val vBefore = t.version
    t.update("id = 2", Map("s" -> "'updated'"))
    val after = idsOf(loc)
    // untouched row: identical
    assert(after(1L) == before(1L))
    // updated row: same id, commit version advanced to the UPDATE commit
    assert(after(2L)._1 == before(2L)._1, s"${before(2L)} -> ${after(2L)}")
    assert(after(2L)._2 == vBefore + 1, s"${after(2L)._2} != ${vBefore + 1}")
    assert(t.toDF.filter("id = 2").select("s").head.getString(0) == "updated")
  }

  test("OPTIMIZE preserves ids and commit versions through compaction") {
    val loc = TestSpark.tmpDir("rt-opt") + "/t"
    val t = mkTable(loc)
    t.append(Seq((3L, "c")).toDF("id", "s"))
    t.append(Seq((4L, "d")).toDF("id", "s"))
    val before = idsOf(loc)
    t.optimize()
    assert(DeltaLog.snapshot(spark, loc).files.size == 1)
    val after = idsOf(loc)
    assert(after == before, s"$before -> $after")
  }

  test("MERGE: updates keep ids, inserts allocate fresh ones") {
    val loc = TestSpark.tmpDir("rt-merge") + "/t"
    val t = mkTable(loc)
    val before = idsOf(loc)
    t.merge(Seq((2L, "upd"), (7L, "new")).toDF("id", "s"), "t.id = s.id")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    val after = idsOf(loc)
    assert(after.keySet == Set(1L, 2L, 7L))
    assert(after(1L) == before(1L))
    assert(after(2L)._1 == before(2L)._1)       // update keeps the id
    assert(after(2L)._2 > before(2L)._2)        // but takes the merge commit
    assert(!before.values.map(_._1).toSet.contains(after(7L)._1)) // fresh id
    val hwm = RowTracking.highWaterMark(DeltaLog.replayState(spark, loc, None)._1.domains)
    assert(after(7L)._1 <= hwm)
  }

  test("DV-mode rewrites preserve ids too (merge-on-read)") {
    val loc = TestSpark.tmpDir("rt-dv") + "/t"
    DeltaLogWriter.create(spark, loc, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"),
      properties = Map(RowTracking.EnableProp -> "true",
        "delta.enableDeletionVectors" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    val before = idsOf(loc)
    t.delete("id = 1")
    // DV delete: no rewrite at all — survivors bitwise identical
    val afterDel = idsOf(loc)
    assert(afterDel == before - 1L, s"$before -> $afterDel")
    t.update("id = 2", Map("s" -> "'u'"))
    val afterUpd = idsOf(loc)
    assert(afterUpd(2L)._1 == before(2L)._1)
    assert(afterUpd(2L)._2 > before(2L)._2)
    assert(afterUpd(3L) == before(3L))
  }

  test("id ranges survive a checkpointed replay") {
    val loc = TestSpark.tmpDir("rt-ckpt") + "/t"
    val t = mkTable(loc)
    (1 to DeltaLogWriter.CheckpointInterval + 1).foreach(i =>
      t.append(Seq((10L + i, s"x$i")).toDF("id", "s")))
    val f = TxLog.fs(spark, loc)
    val logDir = new org.apache.hadoop.fs.Path(loc, "_delta_log")
    val ckptV = f.listStatus(logDir).map(_.getPath.getName)
      .filter(_.contains(".checkpoint.")).flatMap(_.takeWhile(_ != '.').toLongOption)
      .maxOption.getOrElse(fail("no checkpoint"))
    f.listStatus(logDir).map(_.getPath).filter { p =>
      p.getName.endsWith(".json") && !p.getName.startsWith(".") &&
        p.getName.stripSuffix(".json").toLongOption.exists(_ <= ckptV)
    }.foreach(p => f.delete(p, false))
    val withIds = DeltaLog.toDFWithRowIds(spark, loc)
    val n = withIds.count()
    assert(withIds.select("_row_id").distinct().count() == n)
    val hwm = RowTracking.highWaterMark(DeltaLog.replayState(spark, loc, None)._1.domains)
    assert(hwm >= n - 1)
  }
}
