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

  test("rewrites are refused on row-tracking tables; appends are not") {
    val loc = TestSpark.tmpDir("rt-refuse") + "/t"
    val t = mkTable(loc)
    t.append(Seq((9L, "z")).toDF("id", "s"))
    intercept[UnsupportedOperationError] { t.delete("id = 1") }
    intercept[UnsupportedOperationError] { t.update("id = 1", Map("s" -> "'q'")) }
    intercept[UnsupportedOperationError] { t.overwrite(Seq((1L, "x")).toDF("id", "s")) }
    assert(t.toDF.count() == 3)
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
