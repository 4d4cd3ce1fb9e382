package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Type widening (PROTOCOL.md "Type Widening"): a reader must read files
  * written with the PRE-widening narrower physical type using the table's
  * current wider logical type (int->long, float->double, ...). Our scans
  * read every file with the snapshot schema, so widening falls out of the
  * parquet reader's upcast support — this pins that behavior before the
  * feature is declared supported.
  */
class TypeWideningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("files written as int/float read back as long/double after widening") {
    val loc = TestSpark.tmpDir("widen") + "/t"
    // v0: narrow types (int, float)
    DeltaLogWriter.create(spark, loc,
      Seq((1, 1.5f), (2, 2.5f)).toDF("n", "x"))
    // a foreign engine widens the schema (new metaData action) and appends
    // a file with the wider types, declaring the feature at v3/v7
    val widened = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType)))
    val snap0 = DeltaLog.snapshot(spark, loc)
    val adds = TxLog.stageData(spark, loc, Seq((3L, 3.5d)).toDF("n", "x"), Seq.empty)
    val meta = s"""{"metaData":{"id":"widen-test","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(org.json4s.JString(widened.json)))},"partitionColumns":[],"configuration":{}}}"""
    DeltaLogWriter.writeCommit(spark, loc, 1L, Seq(
      """{"commitInfo":{"timestamp":1,"operation":"ADD COLUMNS","operationParameters":{}}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""",
      meta) ++ adds.map(DeltaLogWriter.addAction(widened, _)))

    val t = TxTable.forForeignDelta(spark, loc)
    assert(t.snapshot.schema == widened)
    val got = t.toDF.orderBy("n").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)), got.mkString(","))
    assert(snap0.schema.fields(0).dataType.typeName == "integer")
  }
}
