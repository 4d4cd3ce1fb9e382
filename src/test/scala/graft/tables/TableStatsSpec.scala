package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata-only statistics (countRows/describeStats) and incremental
  * compaction (optimizeCompact) — the O(metadata) maintenance surface a
  * 100 TB table needs: counting must not scan, nightly compaction must
  * touch only small-file debris.
  */
class TableStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("atomicPublishNoOverwrite never replaces an existing commit file") {
    val dir = TestSpark.tmpDir("atomic")
    val f = TxLog.fs(spark, dir)
    val target = new org.apache.hadoop.fs.Path(dir, "00000000000000000001.json")
    def tmpWith(content: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(dir, s".tmp-${java.util.UUID.randomUUID()}.json")
      val o = f.create(p, false); o.write(content.getBytes("UTF-8")); o.close(); p
    }
    assert(TxLog.atomicPublishNoOverwrite(f, tmpWith("winner"), target))
    // the loser must NOT clobber the winner (POSIX rename would)
    assert(!TxLog.atomicPublishNoOverwrite(f, tmpWith("loser"), target))
    val bytes = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(f.open(target)), "UTF-8")
    assert(bytes == "winner")
    // both tmp files consumed
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .exists(_.getPath.getName.startsWith(".tmp-")))
  }

  test("countRows is exact from metadata on the native log") {
    val loc = TestSpark.tmpDir("stats-native")
    val t = new TxTable(spark, loc)
    t.create((0L until 100L).map(i => (i, s"v$i")).toDF("id", "s").repartition(3))
    t.append((100L until 150L).map(i => (i, s"v$i")).toDF("id", "s").repartition(2))
    assert(t.countRows() == 150L)
    t.delete("id < 10")
    assert(t.countRows() == 140L)
    assert(t.countRows() == t.toDF.count())
    val st = t.describeStats()
    assert(st.rowCount == 140L)
    assert(st.fileCount == t.snapshot.files.size)
    assert(st.sizeBytes == t.snapshot.files.map(_.sizeBytes).sum)
  }

  test("countRows launches ZERO Spark jobs when every file has stats") {
    val loc = TestSpark.tmpDir("stats-nojob")
    val t = new TxTable(spark, loc)
    t.create((0L until 1000L).map(i => (i, i * 2)).toDF("id", "v").repartition(4))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(t.countRows() == 1000L)
      // listener events post asynchronously; a job-start would land well
      // within this window (and the assertion is one-sided: zero stays zero)
      Thread.sleep(500)
      assert(jobs.get() == 0, s"metadata count must not launch jobs, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("countRows subtracts live deletion-vector cardinalities (no scan needed)") {
    val loc = TestSpark.tmpDir("stats-dv")
    val li = (0L until 200L).map(i => (i, i % 7)).toDF("id", "k")
    DeltaLogWriter.create(spark, loc, li,
      properties = Map("delta.enableDeletionVectors" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.delete("k = 3") // merge-on-read: rows stay physical, DV carries the holes
    assert(t.snapshot.files.exists(_.deletionVector.exists(_.cardinality > 0)))
    assert(t.countRows() == t.toDF.count())
  }

  test("countRows falls back to scanning ONLY the files with no recorded stats") {
    val loc = TestSpark.tmpDir("stats-nostats")
    def one(df: DataFrame, name: String): Long = {
      val tmp = TestSpark.tmpDir("stats-stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = Paths.get(loc, name)
      Files.createDirectories(dest.getParent)
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.size(dest)
    }
    val sz1 = one(Seq(0L, 1L, 2L).toDF("id"), "a.parquet")
    val sz2 = one(Seq(3L, 4L).toDF("id"), "b.parquet")
    val schemaJ = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JString(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))).json)))
    val log = Paths.get(loc, "_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve("00000000000000000000.json"), (Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},"schemaString":$schemaJ,"partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":$sz1,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":3}"}}""",
      // foreign writer omitted stats entirely -> rows unknown in the manifest
      s"""{"add":{"path":"b.parquet","partitionValues":{},"size":$sz2,"modificationTime":1,"dataChange":true}}"""
    ).mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    val t = TxTable.forForeignDelta(spark, loc)
    assert(t.snapshot.files.exists(_.rows < 0L)) // the fallback is exercised
    assert(t.countRows() == 5L)
  }

  test("optimizeCompact rewrites only small files, leaving well-sized ones alone") {
    val loc = TestSpark.tmpDir("compact")
    val t = new TxTable(spark, loc)
    // one well-sized file, then small-file debris from trickle appends
    t.create((0L until 5000L).map(i => (i, s"payload-$i")).toDF("id", "s").repartition(1))
    (0 until 6).foreach { k =>
      t.append(Seq((10000L + k, s"late-$k")).toDF("id", "s").repartition(1))
    }
    val before = t.snapshot
    assert(before.files.size == 7)
    val big = before.files.maxBy(_.sizeBytes)
    val checksum = t.toDF.agg(sum(col("id"))).collect()(0).getLong(0)

    assert(t.optimizeCompact(minFileBytes = big.sizeBytes, targetFileBytes = 1L << 30))
    val after = t.snapshot
    // the big file survived untouched; the 6 debris files became one
    assert(after.files.exists(_.path == big.path))
    assert(after.files.size == 2)
    assert(t.toDF.agg(sum(col("id"))).collect()(0).getLong(0) == checksum)
    assert(t.countRows() == 5006L)

    // idempotent: nothing left to compact -> no commit published
    val v = t.snapshot.version
    assert(!t.optimizeCompact(minFileBytes = big.sizeBytes, targetFileBytes = 1L << 30))
    assert(t.snapshot.version == v)
  }

  test("optimizeCompact bins per partition tuple, never across") {
    val loc = TestSpark.tmpDir("compact-part")
    val t = new TxTable(spark, loc)
    t.create(Seq((0L, "x"), (1L, "y")).toDF("id", "p").repartition(1),
      partitionColumns = Seq("p"))
    (0 until 4).foreach { k =>
      t.append(Seq((10L + k, "x"), (20L + k, "y")).toDF("id", "p").repartition(1))
    }
    // per-partition metadata stats agree with a real count
    val ps = t.partitionStats().map { case (pv, st) => pv("p") -> st.rowCount }.toMap
    assert(ps == Map("x" -> 5L, "y" -> 5L))
    val before = t.snapshot
    assert(before.files.count(_.partitionValues("p") == "x") == 5)
    assert(t.optimizeCompact(minFileBytes = 1L << 20, targetFileBytes = 1L << 30))
    val after = t.snapshot
    // one compacted file per partition, values intact
    assert(after.files.count(_.partitionValues("p") == "x") == 1)
    assert(after.files.count(_.partitionValues("p") == "y") == 1)
    assert(t.toDF.filter(col("p") === "x").count() == 5)
    assert(t.toDF.filter(col("p") === "y").count() == 5)
  }

  test("OPTIMIZE ... WHERE scopes compaction to matching partitions") {
    val loc = TestSpark.tmpDir("compact-where")
    val t = new TxTable(spark, loc)
    t.create(Seq((0L, "x"), (1L, "y")).toDF("id", "p").repartition(1),
      partitionColumns = Seq("p"))
    (0 until 4).foreach { k =>
      t.append(Seq((10L + k, "x"), (20L + k, "y")).toDF("id", "p").repartition(1))
    }
    val before = t.snapshot
    assert(before.files.count(_.partitionValues("p") == "x") == 5)
    assert(t.optimizeCompact(minFileBytes = 1L << 20, targetFileBytes = 1L << 30,
      where = Some("p = 'x'")))
    val after = t.snapshot
    // x compacted to one file; y untouched — same five files as before
    assert(after.files.count(_.partitionValues("p") == "x") == 1)
    assert(after.files.filter(_.partitionValues("p") == "y").map(_.path).toSet ==
      before.files.filter(_.partitionValues("p") == "y").map(_.path).toSet)
    assert(t.toDF.count() == 10L)
    // predicates outside partition columns (or unparseable scope) refuse
    intercept[graft.catalog.UnsupportedOperationError] {
      t.optimizeCompact(where = Some("id > 3"))
    }
    intercept[graft.catalog.UnsupportedOperationError] {
      t.optimizeCompact(where = Some("p = 'x' OR p = 'y'"))
    }
    // SQL surface
    val client = new graft.client.LakehouseClient(spark)
    client.createCatalog("ow1")
    client.createSchema("ow1", "s")
    client.registerAsTable("ow1", "s", "t", graft.catalog.FileType.DELTA, loc)
    (0 until 3).foreach { k =>
      t.append(Seq((30L + k, "y")).toDF("id", "p").repartition(1))
    }
    spark.sql("OPTIMIZE ow1.s.t WHERE p = 'y'")
    assert(t.snapshot.files.count(_.partitionValues("p") == "y") == 1)
    intercept[Exception] { spark.sql("OPTIMIZE ow1.s.t WHERE id > 3") }
  }

  test("optimizeCompact works through the Delta and Iceberg logs too") {
    for (backend <- Seq("delta", "iceberg")) {
      val loc = TestSpark.tmpDir(s"compact-$backend") + "/t"
      val t = backend match {
        case "delta" =>
          DeltaLogWriter.create(spark, loc, Seq((0L, "a")).toDF("id", "s"))
          TxTable.forForeignDelta(spark, loc)
        case _ =>
          IcebergWriter.create(spark, loc, Seq((0L, "a")).toDF("id", "s"))
          TxTable.forIceberg(spark, loc)
      }
      (1 to 4).foreach(k => t.append(Seq((k.toLong, s"v$k")).toDF("id", "s").repartition(1)))
      assert(t.snapshot.files.size >= 5)
      assert(t.optimizeCompact(minFileBytes = 1L << 20, targetFileBytes = 1L << 30))
      assert(t.snapshot.files.size == 1)
      assert(t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq == (0L to 4L))
      assert(t.countRows() == 5L)
    }
  }
}
