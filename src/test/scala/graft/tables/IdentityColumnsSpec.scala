package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.UnsupportedOperationError

/** Delta identity columns: dense allocation above the high watermark,
  * watermark published atomically with the rows, GENERATED ALWAYS gating
  * — on both log formats.
  */
class IdentityColumnsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def idMeta(start: Long = 1L, step: Long = 1L, allow: Boolean = false) = {
    val b = new MetadataBuilder()
      .putLong(IdentityColumns.StartKey, start)
      .putLong(IdentityColumns.StepKey, step)
    if (allow) b.putBoolean(IdentityColumns.AllowKey, true)
    b.build()
  }

  /** (uid GENERATED ALWAYS AS IDENTITY(start 100, step 10), s) */
  private def seed(start: Long = 100L, step: Long = 10L, allow: Boolean = false): DataFrame =
    Seq((100L, "a"), (110L, "b")).toDF("uid", "s")
      .select(col("uid").as("uid", idMeta(start, step, allow)), col("s"))

  private def uids(t: TxTable): Seq[Long] =
    t.toDF.select("uid").collect().map(_.getLong(0)).toSeq.sorted

  test("append without the column allocates dense values above the watermark") {
    val loc = TestSpark.tmpDir("id-native") + "/t"
    val t = new TxTable(spark, loc)
    t.create(seed())
    // no watermark yet -> allocation starts at `start`... but rows 100/110
    // exist from create; spec tables carry the watermark from creation.
    // Set it explicitly the way delta-rs does on CTAS:
    t.append(Seq("c", "d", "e").toDF("s"))
    val got = uids(t)
    assert(got.size == 5 && got.distinct.size == 5, got.mkString(","))
    // allocated values follow the progression start + n*step
    assert(got.forall(v => (v - 100L) % 10L == 0), got.mkString(","))

    // the watermark advanced and the NEXT append continues above it
    val hwm1 = IdentityColumns.of(t.snapshot.schema).head.metadata.getLong(IdentityColumns.HwmKey)
    assert(hwm1 == got.max)
    t.append(Seq("f").toDF("s"))
    val got2 = uids(t)
    assert(got2.size == 6 && got2.max == hwm1 + 10L)
  }

  test("GENERATED ALWAYS: explicit values refused; allowExplicitInsert admits and advances") {
    val loc = TestSpark.tmpDir("id-always") + "/t"
    val t = new TxTable(spark, loc)
    t.create(seed())
    intercept[UnsupportedOperationError] {
      t.append(Seq((500L, "x")).toDF("uid", "s"))
    }

    val loc2 = TestSpark.tmpDir("id-allow") + "/t"
    val t2 = new TxTable(spark, loc2)
    t2.create(seed(allow = true))
    t2.append(Seq((500L, "x")).toDF("uid", "s"))
    val hwm = IdentityColumns.of(t2.snapshot.schema).head.metadata.getLong(IdentityColumns.HwmKey)
    assert(hwm == 500L)
    t2.append(Seq("auto").toDF("s"))
    assert(uids(t2).max == 510L) // continues above the explicit value
  }

  test("foreign Delta: allocation commits a metaData action other engines see") {
    val loc = TestSpark.tmpDir("id-delta") + "/t"
    DeltaLogWriter.create(spark, loc, seed())
    val t = TxTable.forForeignDelta(spark, loc)
    t.append(Seq("c", "d").toDF("s"))
    assert(uids(t).size == 4)
    // the commit carries the watermark in a metaData action (re-read from
    // a cold replay, not this handle's cache)
    val hwm = IdentityColumns.of(DeltaLog.snapshot(spark, loc).schema)
      .head.metadata.getLong(IdentityColumns.HwmKey)
    assert(hwm == uids(t).max)
    // a v7 table declaring the feature is writable
    DeltaLogWriter.writeCommit(spark, loc, t.version + 1, Seq(
      """{"commitInfo":{"timestamp":1,"operation":"UPGRADE PROTOCOL","operationParameters":{}}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["identityColumns"]}}"""))
    t.append(Seq("e").toDF("s"))
    assert(uids(t).size == 5)
  }

  test("allocation evaluates the upstream plan exactly once") {
    // the count pass + assign pass used to re-run the whole upstream plan
    // twice; the persisted source must bound upstream evaluations at one
    // per partition regardless of how many passes read it
    val evals = spark.sparkContext.longAccumulator("upstream-evals")
    val src = spark.range(0, 1000, 1, 4).toDF("x")
      .mapPartitions { it => evals.add(1); it }(
        org.apache.spark.sql.Encoders.row(spark.range(1).toDF("x").schema))
      .selectExpr("x", "cast(x as string) as s")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("uid", org.apache.spark.sql.types.LongType,
        nullable = false, metadata = idMeta())))
    val (out, hwms) = IdentityColumns.assign(src, schema)
    assert(out.count() == 1000)
    assert(hwms("uid") == 1000L)
    assert(evals.value == 4L, s"upstream evaluated ${evals.value} partition-passes; expected 4")
  }

  test("overwrite does not reset the watermark (replaced values stay burned)") {
    val loc = TestSpark.tmpDir("id-ow") + "/t"
    val t = new TxTable(spark, loc)
    t.create(seed())
    t.append(Seq("c").toDF("s"))
    val burned = uids(t).max
    t.overwrite(Seq("z").toDF("s"))
    val after = uids(t)
    assert(after.size == 1 && after.head > burned, s"after=$after burned=$burned")
  }
}
