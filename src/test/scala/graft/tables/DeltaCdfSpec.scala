package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Change Data Feed over real Delta logs: partial-rewrite commits carry
  * cdc actions + `_change_data/` parquet, append/overwrite commits derive,
  * OPTIMIZE is invisible (dataChange=false), and tableChanges surfaces it
  * all as `_change_type`/`_commit_version`/`_commit_timestamp`.
  */
class DeltaCdfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val CdfProps = Map("delta.enableChangeDataFeed" -> "true")

  private def base: DataFrame =
    Seq((0L, 10.0, "a"), (1L, 20.0, "a"), (2L, 30.0, "b"), (3L, 40.0, "b"))
      .toDF("id", "amount", "tag")

  private def changesOf(t: TxTable, from: Long, to: Option[Long] = None): Seq[(Long, String, Long)] =
    t.tableChanges(from, to)
      .select(col("id"), col(DeltaCdf.ChangeTypeCol), col(DeltaCdf.CommitVersionCol))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted

  private def rawCommit(loc: String, v: Long): String =
    new String(Files.readAllBytes(
      Paths.get(loc, "_delta_log", f"$v%020d.json")), "UTF-8")

  test("DELETE writes cdc actions; tableChanges surfaces deletes and derived inserts") {
    val loc = TestSpark.tmpDir("cdf-del")
    DeltaLogWriter.create(spark, loc, base, properties = CdfProps)
    val t = TxTable.forForeignDelta(spark, loc)
    t.delete("amount >= 30.0") // v1: copy-on-write with cdc
    assert(rawCommit(loc, 1).contains("\"cdc\""))
    assert(Files.list(Paths.get(loc, DeltaCdf.ChangeDataDir)).count() > 0)
    assert(t.toDF.count() == 2)
    val ch = changesOf(t, 0)
    // v0 derives 4 inserts; v1's cdc is exactly the 2 deleted rows (the
    // surviving rewritten rows do NOT appear)
    assert(ch == Seq((0L, "insert", 0L), (1L, "insert", 0L), (2L, "delete", 1L),
      (2L, "insert", 0L), (3L, "delete", 1L), (3L, "insert", 0L)).sorted)
    // range-limited: only v1
    assert(changesOf(t, 1) == Seq((2L, "delete", 1L), (3L, "delete", 1L)))
  }

  test("UPDATE emits update_preimage/update_postimage pairs") {
    val loc = TestSpark.tmpDir("cdf-upd")
    DeltaLogWriter.create(spark, loc, base, properties = CdfProps)
    val t = TxTable.forForeignDelta(spark, loc)
    t.update("tag = 'a'", Map("amount" -> "amount + 1.0"))
    val ch = t.tableChanges(1).select("id", "amount", DeltaCdf.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq.sorted
    assert(ch == Seq((0L, 10.0, "update_preimage"), (0L, 11.0, "update_postimage"),
      (1L, 20.0, "update_preimage"), (1L, 21.0, "update_postimage")).sorted)
  }

  test("MERGE emits insert, delete, and update pre/post rows") {
    val loc = TestSpark.tmpDir("cdf-merge")
    DeltaLogWriter.create(spark, loc, base, properties = CdfProps)
    val t = TxTable.forForeignDelta(spark, loc)
    val source = Seq((1L, 99.0, "u"), (3L, 0.0, "d"), (9L, 5.0, "n"))
      .toDF("id", "amount", "tag")
    t.merge(source, "t.id = s.id")
      .whenMatchedDelete(Some("s.tag = 'd'"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    val ch = t.tableChanges(1).select("id", DeltaCdf.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(ch == Seq((1L, "update_preimage"), (1L, "update_postimage"),
      (3L, "delete"), (9L, "insert")).sorted)
    assert(t.toDF.count() == 4)
  }

  test("OPTIMIZE commits dataChange=false and stays out of the feed") {
    val loc = TestSpark.tmpDir("cdf-opt")
    DeltaLogWriter.create(spark, loc, base.repartition(4), properties = CdfProps)
    val t = TxTable.forForeignDelta(spark, loc)
    t.optimize()
    assert(rawCommit(loc, 1).contains("\"dataChange\":false"))
    assert(changesOf(t, 1).isEmpty)
    // the streaming/changesSince add feed skips it too
    assert(t.changesSince(0).count() == 0)
    assert(t.toDF.count() == 4)
  }

  test("merge-on-read DELETE and UPDATE on a DV table still write cdc") {
    val loc = TestSpark.tmpDir("cdf-dv")
    DeltaLogWriter.create(spark, loc, base,
      properties = CdfProps + ("delta.enableDeletionVectors" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.delete("id = 0")
    t.update("id = 1", Map("amount" -> "21.5"))
    assert(rawCommit(loc, 1).contains("\"cdc\"") && rawCommit(loc, 2).contains("\"cdc\""))
    val ch = changesOf(t, 1)
    assert(ch == Seq((0L, "delete", 1L), (1L, "update_preimage", 2L),
      (1L, "update_postimage", 2L)).sorted)
    assert(t.toDF.count() == 3)
  }

  test("partitioned table: cdc rows carry partition values") {
    val loc = TestSpark.tmpDir("cdf-part")
    DeltaLogWriter.create(spark, loc, base, partitionColumns = Seq("tag"),
      properties = CdfProps)
    val t = TxTable.forForeignDelta(spark, loc)
    t.delete("id = 2")
    val ch = t.tableChanges(1).select("id", "tag", DeltaCdf.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(ch == Seq((2L, "b", "delete")))
  }

  test("replaceWhere feeds replaced rows out and new rows in") {
    val loc = TestSpark.tmpDir("cdf-rw")
    DeltaLogWriter.create(spark, loc, base, properties = CdfProps)
    val t = TxTable.forForeignDelta(spark, loc)
    t.replaceWhere(Seq((7L, 70.0, "a")).toDF("id", "amount", "tag"), "tag = 'a'")
    val ch = changesOf(t, 1)
    assert(ch == Seq((0L, "delete", 1L), (1L, "delete", 1L), (7L, "insert", 1L)).sorted)
    assert(t.toDF.count() == 3)
  }

  test("enabling CDF via SET TBLPROPERTIES upgrades the protocol to writer v4") {
    val loc = TestSpark.tmpDir("cdf-proto")
    DeltaLogWriter.create(spark, loc, base) // protocol (1,2)
    val t = TxTable.forForeignDelta(spark, loc)
    t.setProperties(CdfProps)
    val (st, _) = DeltaLog.replayState(spark, loc, None)
    assert(st.minWriter == 4, s"expected writer v4 after enabling CDF, got ${st.minWriter}")
    // a table created WITH the property is born v4
    val loc2 = TestSpark.tmpDir("cdf-proto2")
    DeltaLogWriter.create(spark, loc2, base, properties = CdfProps)
    val (st2, _) = DeltaLog.replayState(spark, loc2, None)
    assert(st2.minWriter == 4)
    // and a foreign v4 CDF table is writable now (previously refused)
    TxTable.forForeignDelta(spark, loc2).append(
      Seq((8L, 80.0, "c")).toDF("id", "amount", "tag"))
  }

  test("column-mapped CDF table writes cdc files with physical names") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val loc = TestSpark.tmpDir("cdf-map")
    val physical = StructType(Seq(
      StructField("col-x", LongType), StructField("col-y", DoubleType)))
    val d = spark.createDataFrame(java.util.List.of(
      Row(0L, 10.0), Row(1L, 20.0), Row(2L, 30.0), Row(3L, 40.0)), physical)
    // one physical-named parquet file, referenced by a hand-written log
    val tmp = TestSpark.tmpDir("cdf-map-pq")
    d.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(Paths.get(loc))
    Files.copy(part, Paths.get(loc, "f1.parquet"))
    val sz = Files.size(Paths.get(loc, "f1.parquet"))
    def mapped(name: String, phys: String, id: Long, dt: DataType) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      mapped("id", "col-x", 1L, LongType), mapped("amount", "col-y", 2L, DoubleType)))
    val conf =
      """"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2","delta.enableChangeDataFeed":"true""""
    val log = Paths.get(loc, "_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve("00000000000000000000.json"), (Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"cdf-map-fixture","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(org.json4s.JString(logical.json)))},"partitionColumns":[],"configuration":{$conf}}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true}}""")
      .mkString("\n") + "\n").getBytes("UTF-8"))

    val tm = TxTable.forForeignDelta(spark, loc)
    tm.delete("id = 3")
    assert(rawCommit(loc, 1).contains("\"cdc\""))
    val ch = tm.tableChanges(1).select("id", DeltaCdf.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ch == Seq((3L, "delete")))
    assert(tm.toDF.count() == 3)
    // the staged cdc parquet speaks physical names + _change_type
    val cdcFile = Files.walk(Paths.get(loc, DeltaCdf.ChangeDataDir))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    assert(spark.read.parquet(cdcFile.toString).schema.fieldNames.toSet ==
      Set("col-x", "col-y", DeltaCdf.ChangeTypeCol))
  }
}
