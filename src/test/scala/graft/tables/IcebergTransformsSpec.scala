package graft.tables

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.IceMurmur

/** Iceberg hidden partitioning: the spec's murmur3 hash vectors (Appendix
  * B — any deviation silently prunes the WRONG files on tables other
  * engines wrote), transform staging, and predicate projection pruning.
  */
class IcebergTransformsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("murmur3 matches the Iceberg spec's published hash vectors") {
    // spec Appendix B: int/long hash as 8-byte little-endian longs
    assert(IceMurmur.hashLong(34L) == 2017239379)
    // date 2017-11-16 = 17486 days since epoch
    assert(IceMurmur.hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert(IceMurmur.hashLong(1510871468000000L) == -2047944441)
    // string hashes raw UTF-8 bytes
    assert(IceMurmur.hashBytes("iceberg".getBytes(UTF_8)) == 1210000089)
    // fixed/binary 00 01 02 03
    assert(IceMurmur.hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
    // bucket id is positive-hash mod N
    assert(IceMurmur.bucketLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
    assert(IceMurmur.bucketString("iceberg", 16) == (1210000089 & Int.MaxValue) % 16)
  }

  test("user transform syntax parses; column and literal projection agree") {
    import IceTransforms._
    assert(parseUser("bucket(16, id)") == (("id", Bucket(16))))
    assert(parseUser("truncate(4, s)") == (("s", Truncate(4))))
    assert(parseUser("day(ts)") == (("ts", Day)))
    assert(parseUser("plain_col") == (("plain_col", Identity)))
    // metadata serialization round-trips
    assert(parseSpec(Bucket(16).spec).contains(Bucket(16)))
    assert(parseSpec(Truncate(4).spec).contains(Truncate(4)))
    assert(parseSpec("day").contains(Day))
    assert(parseSpec("zorder[3]").isEmpty) // unknown → no pruning, no write
  }

  private def docsDf: DataFrame =
    (0L until 200L).map(i =>
      (i, s"k${i % 7}", java.sql.Date.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays((i % 90).toInt).toString),
        java.sql.Timestamp.from(java.time.Instant.parse("2021-06-01T00:00:00Z").plusSeconds(i * 7200))))
      .toDF("id", "k", "d", "ts")

  test("bucket-partitioned create: equality predicates prune to one bucket") {
    val loc = TestSpark.tmpDir("ice-bucket") + "/t"
    IcebergWriter.create(spark, loc, docsDf, Seq("bucket(8, id)"))
    val total = IcebergLog.state(spark, loc).files.size
    assert(total == 8, s"expected 8 bucket files, got $total")
    val pruned = IcebergLog.filesAfterPruning(spark, loc, "id = 42")
    assert(pruned == 1, s"id = 42 should prune to its bucket, read $pruned")
    // the surviving bucket is the RIGHT one
    val got = IcebergLog.scan(spark, loc, "id = 42").select("id").as[Long].collect().toSeq
    assert(got == Seq(42L))
    // range predicates cannot project through bucket — all files read, result right
    assert(IcebergLog.scan(spark, loc, "id < 5").count() == 5)
  }

  test("day/month-partitioned create: range predicates prune date bins") {
    val loc = TestSpark.tmpDir("ice-day") + "/t"
    IcebergWriter.create(spark, loc, docsDf, Seq("month(d)"))
    val total = IcebergLog.state(spark, loc).files.size
    assert(total == 3, s"Jan-Mar 2021 should stage 3 month files, got $total") // 90 days
    assert(IcebergLog.filesAfterPruning(spark, loc, "d >= DATE'2021-03-01'") == 1)
    assert(IcebergLog.scan(spark, loc, "d >= DATE'2021-03-01'").count() ==
      docsDf.filter($"d" >= lit(java.sql.Date.valueOf("2021-03-01"))).count())

    val locTs = TestSpark.tmpDir("ice-dayts") + "/t"
    IcebergWriter.create(spark, locTs, docsDf, Seq("day(ts)"))
    // 200 rows * 2h apart = ~17 days
    val totalTs = IcebergLog.state(spark, locTs).files.size
    assert(totalTs >= 16 && totalTs <= 18, s"got $totalTs day files")
    val prunedTs = IcebergLog.filesAfterPruning(spark, locTs, "ts >= TIMESTAMP'2021-06-15 00:00:00'")
    assert(prunedTs <= 4, s"ts range should prune most day files, read $prunedTs")
    assert(IcebergLog.scan(spark, locTs, "ts >= TIMESTAMP'2021-06-15 00:00:00'").count() ==
      docsDf.filter($"ts" >= lit(java.sql.Timestamp.valueOf("2021-06-15 00:00:00"))).count())
  }

  test("month on TIMESTAMP_NTZ bins the local calendar value and prunes") {
    val loc = TestSpark.tmpDir("ice-ntz") + "/t"
    val df = (0L until 120L).map(i =>
      (i, java.time.LocalDateTime.of(2021, 1, 1, 0, 0).plusDays(i)))
      .toDF("id", "ts") // ts is TIMESTAMP_NTZ via the LocalDateTime encoder
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    IcebergWriter.create(spark, loc, df, Seq("month(ts)"))
    assert(IcebergLog.state(spark, loc).files.size == 4) // Jan..Apr
    assert(IcebergLog.filesAfterPruning(spark, loc,
      "ts >= TIMESTAMP_NTZ'2021-04-01 00:00:00'") == 1)
    assert(IcebergLog.scan(spark, loc, "ts >= TIMESTAMP_NTZ'2021-04-01 00:00:00'").count() ==
      df.filter($"ts" >= lit(java.time.LocalDateTime.of(2021, 4, 1, 0, 0))).count())
  }

  test("truncate-partitioned strings prune equality and range") {
    val loc = TestSpark.tmpDir("ice-trunc") + "/t"
    val df = Seq("apple", "apricot", "banana", "blueberry", "cherry")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    IcebergWriter.create(spark, loc, df, Seq("truncate(2, s)"))
    assert(IcebergLog.state(spark, loc).files.size == 4) // ap, ba, bl, ch
    assert(IcebergLog.filesAfterPruning(spark, loc, "s = 'apple'") == 1)
    assert(IcebergLog.filesAfterPruning(spark, loc, "s >= 'banana'") == 3)
    assert(IcebergLog.scan(spark, loc, "s >= 'banana'").count() == 3)
  }

  test("append and TxTable rewrites keep transformed tuples; scan stays correct") {
    val loc = TestSpark.tmpDir("ice-tx-transform") + "/t"
    IcebergWriter.create(spark, loc, docsDf.filter($"id" < 100), Seq("bucket(8, id)"))
    IcebergWriter.append(spark, loc, docsDf.filter($"id" >= 100))
    assert(IcebergLog.toDF(spark, loc).count() == 200)
    assert(IcebergLog.filesAfterPruning(spark, loc, "id = 42") <= 2) // one per committed batch
    // position-delete DELETE through the writer keeps pruning intact
    IcebergWriter.delete(spark, loc, "id = 42")
    assert(IcebergLog.scan(spark, loc, "id = 42").count() == 0)
    assert(IcebergLog.toDF(spark, loc).count() == 199)
    // TxTable surface over the same table still reads/writes
    val t = TxTable.forAnyLocation(spark, loc)
    assert(t.toDF.count() == 199)
    t.append(docsDf.filter($"id" === 42))
    assert(TxTable.forAnyLocation(spark, loc).toDF.count() == 200)
    // the TxTable-staged add carries its bucket tuple → pruning still tight
    assert(IcebergLog.filesAfterPruning(spark, loc, "id = 42") <= 3)
  }

  test("overwrite re-clusters and adoptSchema keeps the transformed spec") {
    val loc = TestSpark.tmpDir("ice-ow-transform") + "/t"
    IcebergWriter.create(spark, loc, docsDf, Seq("bucket(4, k)"))
    assert(IcebergLog.state(spark, loc).files.size <= 4)
    IcebergWriter.overwrite(spark, loc, docsDf.withColumn("extra", lit(1L)), adoptSchema = true)
    val st = IcebergLog.state(spark, loc)
    assert(st.schema.fieldNames.contains("extra"))
    assert(st.transformFields.map(x => (x._1, x._3)) == Seq(("k_bucket", "k")))
    val pruned = IcebergLog.filesAfterPruning(spark, loc, "k = 'k3'")
    assert(pruned == 1, s"bucket(k) should survive adoptSchema, read $pruned")
    assert(IcebergLog.scan(spark, loc, "k = 'k3'").count() ==
      docsDf.filter($"k" === "k3").count())
  }
}
