package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The column-stats stamp must behave identically on ALL THREE commit
  * logs — native, real _delta_log, Iceberg: analyze, serve, fold on
  * append, invalidate on delete.
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
    // delete invalidates
    t.delete("id = 0")
    assert(!ColumnStats.isFresh(t.snapshot))
    assert(ColumnStats.currentNdv(t.snapshot, "id").isEmpty)
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
    t.delete("id = 0")
    assert(!ColumnStats.isFresh(t.snapshot))
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
    t.delete("id = 0")
    assert(!ColumnStats.isFresh(t.snapshot))
  }
}
