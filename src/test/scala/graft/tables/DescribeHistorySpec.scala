package graft.tables

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DESCRIBE HISTORY over all three logs: one row per commit, newest
  * first, with the operation labels each log records.
  */
class DescribeHistorySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ops(t: TxTable): Seq[(Long, String)] =
    t.describeHistory.collect().map(r => (r.getLong(0), r.getString(2))).toSeq

  test("native log: version/operation/file counts, newest first") {
    val loc = TestSpark.tmpDir("hist-native") + "/t"
    val t = new TxTable(spark, loc)
    t.create(Seq((1L, "a")).toDF("id", "s"))      // v0 CREATE
    t.append(Seq((2L, "b")).toDF("id", "s"))      // v1 APPEND
    t.delete("id = 1")                            // v2 DELETE
    assert(ops(t) == Seq((2L, "DELETE"), (1L, "APPEND"), (0L, "CREATE")))
    val del = t.describeHistory.filter("version = 2").collect()(0)
    assert(del.getInt(4) == 1, "DELETE rewrote (removed) one file")
  }

  test("foreign Delta log: commitInfo operations and add/remove counts") {
    val loc = TestSpark.tmpDir("hist-delta") + "/t"
    DeltaLogWriter.create(spark, loc, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.append(Seq((3L, "c")).toDF("id", "s"))
    val h = t.describeHistory.collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 0L))
    assert(h.forall(_.getLong(1) > 0), "timestamps must resolve")
    assert(h.forall(_.getInt(3) >= 1), "every commit added files")
  }

  test("iceberg log: snapshot ops; metadata-only commits labeled as such") {
    val loc = TestSpark.tmpDir("hist-ice") + "/t"
    IcebergWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s"))   // v1 append
    IcebergWriter.delete(spark, loc, "id = 1")                         // v2 delete
    IcebergWriter.createTag(spark, loc, "rel",
      Some(IcebergLog.history(spark, loc).last)) // v3 refs only
    val t = TxTable.forIceberg(spark, loc)
    assert(ops(t) == Seq((3L, "SET_TBLPROPERTIES"), (2L, "delete"), (1L, "append")))
  }

  test("SQL: DESCRIBE HISTORY on a catalog table") {
    val client = new graft.client.LakehouseClient(spark)
    client.createCatalog("histcat")
    client.createSchema("histcat", "s")
    val dir = TestSpark.tmpDir("hist-sql")
    client.createAsTable(Seq((1L, "a")).toDF("id", "s"),
      "histcat", "s", "t", graft.catalog.FileType.DELTA, s"$dir/t")
    spark.sql("INSERT INTO histcat.s.t VALUES (2, 'b')")
    val rows = spark.sql("DESCRIBE HISTORY histcat.s.t").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 0L))
  }
}
