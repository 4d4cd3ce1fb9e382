package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Delta generated columns: computed when a write omits them, validated
  * when a write provides them, on both log formats (PROTOCOL.md /
  * delta-io "Generated Columns"; delta-rs tables may declare them, so the
  * reference's primary format can carry this metadata).
  */
class GeneratedColumnsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genMeta = new MetadataBuilder()
    .putString(GeneratedColumns.ExprKey, "id * 2").build()

  /** (id, doubled) where doubled is generated as id * 2. */
  private def seed: DataFrame =
    Seq((1L, 2L), (2L, 4L)).toDF("id", "doubled")
      .select(col("id"), col("doubled").as("doubled", genMeta))

  test("foreign Delta: append without the generated column computes it") {
    val loc = TestSpark.tmpDir("gen-delta") + "/t"
    DeltaLogWriter.create(spark, loc, seed)
    val t = TxTable.forForeignDelta(spark, loc)
    t.append(Seq(3L, 4L).toDF("id"))
    val got = t.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L)))
  }

  test("foreign Delta: provided values must match the expression") {
    val loc = TestSpark.tmpDir("gen-delta-bad") + "/t"
    DeltaLogWriter.create(spark, loc, seed)
    val t = TxTable.forForeignDelta(spark, loc)
    // matching values pass
    t.append(Seq((5L, 10L)).toDF("id", "doubled"))
    assert(t.toDF.count() == 3)
    // mismatching values abort the write before any commit
    val e = intercept[Exception] { t.append(Seq((6L, 13L)).toDF("id", "doubled")) }
    assert(e.getMessage.contains("generated column") ||
      Option(e.getCause).exists(_.getMessage.contains("generated column")), e.getMessage)
    assert(t.toDF.count() == 3)
  }

  test("a writer-v7 table with the generatedColumns feature is writable") {
    val loc = TestSpark.tmpDir("gen-v7") + "/t"
    DeltaLogWriter.create(spark, loc, seed)
    DeltaLogWriter.writeCommit(spark, loc, 1L, Seq(
      """{"commitInfo":{"timestamp":1,"operation":"UPGRADE PROTOCOL","operationParameters":{}}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["generatedColumns"]}}"""))
    val t = TxTable.forForeignDelta(spark, loc)
    t.append(Seq(7L).toDF("id"))
    assert(t.toDF.filter(col("id") === 7L).head.getLong(1) == 14L)
  }

  test("native log: same semantics (compute on omit, validate on provide)") {
    val loc = TestSpark.tmpDir("gen-native") + "/t"
    val t = new TxTable(spark, loc)
    t.create(seed)
    t.append(Seq(10L).toDF("id"))
    assert(t.toDF.filter(col("id") === 10L).head.getLong(1) == 20L)
    intercept[Exception] { t.append(Seq((11L, 0L)).toDF("id", "doubled")) }
    assert(t.toDF.count() == 3)
  }

  test("overwrite and idempotent append also complete generated columns") {
    val loc = TestSpark.tmpDir("gen-ow") + "/t"
    val t = new TxTable(spark, loc)
    t.create(seed)
    t.overwrite(Seq(20L, 21L).toDF("id"))
    assert(t.toDF.orderBy("id").collect().map(_.getLong(1)).toSeq == Seq(40L, 42L))
    assert(t.appendIdempotent(Seq(22L).toDF("id"), "gen-app", 0L))
    assert(t.toDF.filter(col("id") === 22L).head.getLong(1) == 44L)
  }
}
