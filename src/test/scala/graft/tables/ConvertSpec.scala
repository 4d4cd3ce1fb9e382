package graft.tables

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.UnsupportedOperationError

/** CONVERT TO DELTA: a plain parquet directory gains a real _delta_log
  * in place — zero bytes copied, full write surface afterwards.
  */
class ConvertSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unpartitioned parquet dir converts; reads and writes work after") {
    val loc = TestSpark.tmpDir("convert-flat") + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .repartition(2).write.parquet(loc)
    val before = new java.io.File(loc).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

    val t = Convert.parquetToDelta(spark, loc)
    assert(DeltaLog.isDeltaTable(spark, loc), "a real _delta_log must exist")
    // zero-copy: the SAME files, referenced relatively
    assert(t.snapshot.files.map(_.path).toSet == before)
    assert(t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // converted adds carry UNKNOWN row counts (-1), never a false 0 —
    // countRows must scan the stat-less files and answer 3 BEFORE any
    // rewrite backfills stats
    assert(t.snapshot.files.forall(_.rows == -1L),
      s"unknown counts must read back unknown, got ${t.snapshot.files.map(_.rows)}")
    assert(t.countRows() == 3L)

    // the converted table has the full write surface
    t.append(Seq((4L, "d")).toDF("id", "s"))
    t.delete("id = 1")
    assert(t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    // rows were unknown at convert time; countRows scans stat-less files
    assert(t.countRows() == 3L)
  }

  test("hive-partitioned dir: partition values parse from the layout and prune") {
    val loc = TestSpark.tmpDir("convert-hive") + "/t"
    Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p2"))
      .toDF("id", "s", "pt").write.partitionBy("pt").parquet(loc)
    // a literal '+' survives conversion (hive escaping leaves it alone;
    // URL-decoding would corrupt it to a space)
    Seq((4L, "w", "a+b")).toDF("id", "s", "pt")
      .write.mode("append").partitionBy("pt").parquet(loc)

    val t = Convert.parquetToDelta(spark, loc)
    assert(t.snapshot.partitionColumns == Seq("pt"))
    assert(t.snapshot.files.forall(a => a.partitionValues.contains("pt")))
    assert(t.toDF.filter("pt = 'p2'").collect().map(_.getLong(0)).toSeq.sorted ==
      Seq(2L, 3L))
    assert(t.toDF.filter("pt = 'a+b'").collect().map(_.getLong(0)).toSeq == Seq(4L))
    // selective partition overwrite works on the converted table
    t.replaceWhere(Seq((9L, "w", "p1")).toDF("id", "s", "pt"), "pt = 'p1'")
    assert(t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L, 9L))
  }

  test("SQL: CONVERT TO DELTA parquet.`path` reports the file count") {
    val loc = TestSpark.tmpDir("convert-sql") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").repartition(2).write.parquet(loc)
    val n = spark.sql(s"CONVERT TO DELTA parquet.`$loc`").collect()(0).getLong(0)
    assert(n == 2L)
    assert(DeltaLog.isDeltaTable(spark, loc))
  }

  test("guards: already-transactional locations and empty dirs refuse") {
    val loc = TestSpark.tmpDir("convert-guard") + "/t"
    new TxTable(spark, loc).create(Seq((1L, "a")).toDF("id", "s"))
    intercept[graft.catalog.AlreadyExistsError](Convert.parquetToDelta(spark, loc))
    intercept[graft.catalog.AlreadyExistsError](Convert.parquetToIceberg(spark, loc))
    val empty = TestSpark.tmpDir("convert-empty")
    intercept[UnsupportedOperationError](Convert.parquetToDelta(spark, empty))
    intercept[UnsupportedOperationError](Convert.parquetToIceberg(spark, empty))
  }

  test("CONVERT TO ICEBERG: flat dir gains spec-real v2 metadata with footer stats") {
    val loc = TestSpark.tmpDir("convert-ice") + "/t"
    (0 until 100).map(i => (i.toLong, s"s$i")).toDF("id", "s")
      .repartition(3).write.parquet(loc)
    val before = new java.io.File(loc).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

    val t = Convert.parquetToIceberg(spark, loc)
    assert(IcebergLog.isIcebergTable(spark, loc))
    // zero-copy: the SAME files
    assert(t.snapshot.files.map(_.path.split('/').last).toSet == before)
    // the footer pass backfilled real counts and bounds — record_count
    // is spec-required and metadata-only counts trust it
    assert(t.snapshot.files.forall(_.rows > 0L))
    assert(t.snapshot.files.map(_.rows).sum == 100L)
    assert(t.countRows() == 100L)
    assert(t.snapshot.files.forall(_.minValues.exists(_.contains("id"))))
    // direct Iceberg read path agrees
    assert(IcebergLog.toDF(spark, loc).count() == 100L)
    // full write surface afterwards (position-delete merge-on-read)
    t.delete("id < 10")
    assert(t.toDF.count() == 90L)
    t.append(Seq((1000L, "x")).toDF("id", "s"))
    assert(t.toDF.count() == 91L)
  }

  test("CONVERT TO ICEBERG: hive layout becomes an identity spec, values substitute") {
    val loc = TestSpark.tmpDir("convert-ice-hive") + "/t"
    Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p2"))
      .toDF("id", "s", "pt").write.partitionBy("pt").parquet(loc)
    val t = Convert.parquetToIceberg(spark, loc)
    assert(t.snapshot.partitionColumns == Seq("pt"))
    // hive layout dropped pt from the data files; the manifest's
    // partition value substitutes per the spec's column-projection rule
    assert(t.toDF.filter("pt = 'p2'").collect().map(_.getLong(0)).toSeq.sorted ==
      Seq(2L, 3L))
    assert(IcebergLog.toDF(spark, loc).filter("pt = 'p1'").count() == 1L)
    // per-tuple metadata stats come straight from the manifest
    val stats = t.partitionStats().toMap
    assert(stats(Map("pt" -> "p2")).rowCount == 2L)
  }

  test("SQL: CONVERT TO ICEBERG parquet.`path` reports the file count") {
    val loc = TestSpark.tmpDir("convert-ice-sql") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").repartition(2).write.parquet(loc)
    val n = spark.sql(s"CONVERT TO ICEBERG parquet.`$loc`").collect()(0).getLong(0)
    assert(n == 2L)
    assert(IcebergLog.isIcebergTable(spark, loc))
  }
}
