package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Delta variant type (PROTOCOL.md "Variant Data Type"): columns of
  * semi-structured data stored as the two-binary-field variant encoding.
  * Spark 4 carries VariantType natively — schemaString round-trips it and
  * the parquet scan reads the physical struct<metadata,value> — so the
  * whole feature reduces to gating once this spec pins create, append,
  * replay, and typed extraction.
  */
class VariantTypeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDf(rows: (Long, String)*) =
    rows.toSeq.toDF("id", "j").select(col("id"), parse_json(col("j")).as("v"))

  test("variant columns round-trip through the Delta log on both formats") {
    for (foreign <- Seq(true, false)) {
      val loc = TestSpark.tmpDir(s"variant-$foreign") + "/t"
      val df = mkDf(1L -> """{"a":1,"b":"x"}""", 2L -> """{"a":2,"b":"y"}""")
      val t = if (foreign) {
        DeltaLogWriter.create(spark, loc, df)
        TxTable.forForeignDelta(spark, loc)
      } else {
        val tt = new TxTable(spark, loc); tt.create(df); tt
      }
      t.append(mkDf(3L -> """{"a":3,"b":"z"}"""))
      val back = t.toDF
      assert(back.schema("v").dataType.typeName == "variant")
      val got = back.select(col("id"),
          variant_get(col("v"), "$.a", "int").as("a"),
          variant_get(col("v"), "$.b", "string").as("b"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      assert(got == Seq((1L, 1, "x"), (2L, 2, "y"), (3L, 3, "z")), got.mkString(","))
    }
  }

  test("a foreign table declaring the variantType feature is readable") {
    val loc = TestSpark.tmpDir("variant-gate") + "/t"
    DeltaLogWriter.create(spark, loc, mkDf(1L -> """{"k":42}"""))
    DeltaLogWriter.writeCommit(spark, loc, 1L, Seq(
      """{"commitInfo":{"timestamp":1,"operation":"UPGRADE","operationParameters":{}}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType"],"writerFeatures":["variantType"]}}"""))
    val t = TxTable.forForeignDelta(spark, loc)
    assert(t.toDF.select(variant_get(col("v"), "$.k", "int")).head.getInt(0) == 42)
    t.append(mkDf(2L -> """{"k":43}"""))
    assert(t.toDF.count() == 2)
  }
}
