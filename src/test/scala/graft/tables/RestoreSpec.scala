package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.{SchemaEvolution, UnsupportedOperationError}

/** RESTORE TO VERSION/TIMESTAMP: one metadata commit flips the live state
  * back; history (including the undone commits) stays time-travelable.
  */
class RestoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base: DataFrame =
    Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "tag")

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("native log: restore undoes delete+append, preserves history") {
    val loc = TestSpark.tmpDir("restore-native")
    val t = new TxTable(spark, loc)
    t.create(base)                                     // v0
    t.append(Seq((3L, "d")).toDF("id", "tag"))         // v1
    t.delete("id <= 1")                                // v2
    assert(ids(t.toDF) == Seq(2L, 3L))
    t.restore(1)                                       // v3
    assert(t.version == 3)
    assert(ids(t.toDF) == Seq(0L, 1L, 2L, 3L))
    // the undone state is still reachable by time travel
    assert(ids(t.toDF(2)) == Seq(2L, 3L))
    t.restore(0)                                       // v4
    assert(ids(t.toDF) == Seq(0L, 1L, 2L))
  }

  test("foreign Delta: restore resets schema after evolution, via a metaData action") {
    val loc = TestSpark.tmpDir("restore-delta")
    DeltaLogWriter.create(spark, loc, base)
    val t = TxTable.forForeignDelta(spark, loc)
    t.append(Seq((3L, "d", 9.0)).toDF("id", "tag", "score"), SchemaEvolution.MERGE) // v1
    assert(t.snapshot.schema.fieldNames.toSeq == Seq("id", "tag", "score"))
    t.restore(0)                                       // v2
    assert(t.snapshot.schema.fieldNames.toSeq == Seq("id", "tag"))
    assert(ids(t.toDF) == Seq(0L, 1L, 2L))
    // external replay agrees (raw log, not our snapshot cache)
    val (st, v) = DeltaLog.replayState(spark, loc, None)
    assert(v == 2 && st.schemaJson == t.snapshot.schema.json)
  }

  test("deletion-vector table: restore resurrects DV-deleted rows") {
    val loc = TestSpark.tmpDir("restore-dv")
    DeltaLogWriter.create(spark, loc, base,
      properties = Map("delta.enableDeletionVectors" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.delete("id = 1")                                 // v1: DV, same path re-added
    assert(ids(t.toDF) == Seq(0L, 2L))
    t.restore(0)                                       // v2: re-add without the DV
    assert(ids(t.toDF) == Seq(0L, 1L, 2L))
    assert(t.snapshot.files.forall(_.deletionVector.isEmpty))
  }

  test("restore to a vacuumed version is refused") {
    val loc = TestSpark.tmpDir("restore-vac")
    val t = new TxTable(spark, loc)
    t.create(base)
    t.overwrite(Seq((9L, "z")).toDF("id", "tag"))      // v1: v0 files inactive
    t.vacuum(retainVersions = 1, retentionMs = 0L, force = true)
    val e = intercept[UnsupportedOperationError](t.restore(0))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("restore by timestamp picks the right version") {
    val loc = TestSpark.tmpDir("restore-ts")
    val t = new TxTable(spark, loc)
    t.create(base)
    val afterV0 = System.currentTimeMillis()
    Thread.sleep(5)
    t.append(Seq((7L, "x")).toDF("id", "tag"))
    t.restoreToTimestamp(afterV0)
    assert(ids(t.toDF) == Seq(0L, 1L, 2L))
  }
}
