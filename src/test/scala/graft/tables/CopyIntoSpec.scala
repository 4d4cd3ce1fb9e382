package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** COPY INTO: exactly-once bulk ingestion — incremental pickup,
  * re-run no-ops, crash-window replay, pattern/format options, vacuum
  * safety of the ingest log, and the SQL statement.
  */
class CopyIntoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dropFiles(dir: String, ids: Range, sub: String = ""): Unit =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
      .write.mode("append").parquet(if (sub.isEmpty) dir else s"$dir/$sub")

  test("loads each source file exactly once across re-runs") {
    val root = TestSpark.tmpDir("copyinto1")
    val src = s"$root/drop"
    val t = new TxTable(spark, s"$root/t")
    t.create(Seq.empty[(Long, String)].toDF("id", "v"))

    dropFiles(src, 0 until 100)
    dropFiles(src, 100 until 200)
    val r1 = CopyInto.run(t, src)
    assert(r1.filesLoaded == 2L && r1.rowsLoaded == 200L && r1.batch == 1L)
    assert(t.toDF.count() == 200L)

    // re-run: nothing new -> a no-op, same data
    val r2 = CopyInto.run(t, src)
    assert(r2.filesLoaded == 0L && r2.rowsLoaded == 0L)
    assert(t.toDF.count() == 200L)

    // incremental: only the newly landed file loads
    dropFiles(src, 200 until 250)
    val r3 = CopyInto.run(t, src)
    assert(r3.filesLoaded == 1L && r3.rowsLoaded == 50L && r3.batch == 2L)
    assert(t.toDF.select(sum(col("id"))).head().getLong(0) == (0L until 250L).sum)
  }

  test("crash between intent and confirm replays exactly the recorded batch") {
    val root = TestSpark.tmpDir("copyinto2")
    val src = s"$root/drop"
    val t = new TxTable(spark, s"$root/t")
    t.create(Seq.empty[(Long, String)].toDF("id", "v"))
    dropFiles(src, 0 until 10)
    assert(CopyInto.run(t, src).filesLoaded == 1L)

    // simulate the crash window: a new file's INTENT lands in the
    // ingest log (batch 2) but the target append never happens
    dropFiles(src, 10 until 30)
    val newFile = TxLog.fs(spark, src).listFiles(new org.apache.hadoop.fs.Path(src), true)
    val fresh = {
      val loaded = new TxTable(spark, s"$root/t/${CopyInto.IngestRoot}/log")
        .toDF.select("source_path").as[String].collect().toSet
      var found: Option[(String, Long, Long)] = None
      while (newFile.hasNext) {
        val st = newFile.next()
        val uri = st.getPath.toUri.toString
        if (st.isFile && uri.endsWith(".parquet") && !loaded(uri))
          found = Some((uri, st.getLen, st.getModificationTime))
      }
      found.get
    }
    val ingest = new TxTable(spark, s"$root/t/${CopyInto.IngestRoot}/log")
    ingest.appendIdempotent(
      Seq(fresh).toDF("source_path", "size_bytes", "mtime")
        .withColumn("batch", lit(2L))
        .withColumn("format", lit("parquet"))
        .withColumn("pattern", lit(null).cast("string"))
        .withColumn("transform", lit(null).cast("string"))
        .withColumn("merge_schema", lit(false)),
      "graft.copyInto.intent", 2L)
    assert(t.toDF.count() == 10L) // data NOT loaded yet

    // re-run: replays batch 2 from the intent, then finds nothing new
    val r = CopyInto.run(t, src)
    assert(r.filesLoaded == 0L, "recovery is replay, not a new batch")
    assert(t.toDF.count() == 30L, "the intent's file must load during recovery")
    // and once more: fully idempotent
    assert(CopyInto.run(t, src).filesLoaded == 0L)
    assert(t.toDF.count() == 30L)
  }

  test("pattern filter, hidden files skipped, vacuum keeps the ingest log") {
    val root = TestSpark.tmpDir("copyinto3")
    val src = s"$root/drop"
    dropFiles(src, 0 until 5, sub = "a")
    dropFiles(src, 5 until 9, sub = "b")
    dropFiles(src, 100 until 105, sub = "_staging") // hidden: never loads
    val t = new TxTable(spark, s"$root/t")
    t.create(Seq.empty[(Long, String)].toDF("id", "v"))
    // only the a/ subtree matches the glob
    val r = CopyInto.run(t, src, pattern = Some("a/*.parquet"))
    assert(r.filesLoaded == 1L && t.toDF.count() == 5L)
    // widening the pattern picks up b/ but never re-loads a/ or hidden
    val r2 = CopyInto.run(t, src, pattern = None)
    assert(r2.filesLoaded == 1L && t.toDF.count() == 9L)

    // vacuum must not touch the ingest log (reserved prefix)
    t.vacuum(retainVersions = 1, retentionMs = 0L, force = true)
    assert(CopyInto.run(t, src).filesLoaded == 0L, "ingest state must survive vacuum")
    assert(t.toDF.count() == 9L)
  }

  test("SQL: COPY INTO statement loads and reports (files, rows, batch)") {
    val client = new graft.client.LakehouseClient(spark)
    client.createCatalog("cpin")
    client.createSchema("cpin", "s")
    val root = TestSpark.tmpDir("copyinto4")
    val src = s"$root/drop"
    dropFiles(src, 0 until 20)
    client.createAsTable(Seq.empty[(Long, String)].toDF("id", "v"),
      "cpin", "s", "t", graft.catalog.FileType.DELTA, s"$root/t")
    val r = spark.sql(s"COPY INTO cpin.s.t FROM '$src' FILEFORMAT = PARQUET")
    assert(r.columns.toSeq == Seq("files_loaded", "rows_loaded", "batch"))
    assert(r.collect()(0).getLong(0) == 1L)
    assert(spark.sql("SELECT COUNT(*) FROM cpin.s.t").collect()(0).getLong(0) == 20L)
    // second run through SQL: no-op
    assert(spark.sql(s"COPY INTO cpin.s.t FROM '$src'").collect()(0).getLong(0) == 0L)
  }

  test("crash after intent: recovery replays with the RECORDED format, not the caller's") {
    val root = TestSpark.tmpDir("copyinto5")
    val src = s"$root/drop"
    (0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
      .write.option("header", "true").mode("append").csv(src)
    val t = new TxTable(spark, s"$root/t")
    t.create(Seq.empty[(Long, String)].toDF("id", "v"))
    // crash window: the csv intent lands, the confirming append never runs
    CopyInto.onIntentRecorded = () => throw new RuntimeException("boom")
    try {
      intercept[RuntimeException] { CopyInto.run(t, src, "csv") }
    } finally CopyInto.onIntentRecorded = () => ()
    assert(t.toDF.count() == 0L, "crashed before the confirm")
    // the recovering invocation asks for PARQUET (the default) — replay
    // must still read the batch as CSV because the intent recorded it
    val r = CopyInto.run(t, src) // no .parquet files listed; pure recovery
    assert(r.filesLoaded == 0L)
    assert(t.toDF.count() == 40L, "csv intent replayed as csv")
    assert(t.toDF.select(sum(col("id"))).head().getLong(0) == (0L until 40L).sum)
  }

  test("FORCE reloads every listed file; changed-content file is skipped without it") {
    val root = TestSpark.tmpDir("copyinto6")
    val src = s"$root/drop"
    dropFiles(src, 0 until 10)
    val t = new TxTable(spark, s"$root/t")
    t.create(Seq.empty[(Long, String)].toDF("id", "v"))
    assert(CopyInto.run(t, src).filesLoaded == 1L)
    assert(t.toDF.count() == 10L)

    // re-drop the SAME path with different content (more rows)
    val fs = TxLog.fs(spark, src)
    val orig = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(src), true)
      var found: org.apache.hadoop.fs.Path = null
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) found = st.getPath
      }
      found
    }
    val tmp = s"$root/tmp"
    (100 until 125).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
      .write.parquet(tmp)
    val replacement = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.delete(orig, false)
    fs.rename(replacement, orig)

    // default: path-keyed exactly-once — the changed file does NOT reload
    val r = CopyInto.run(t, src)
    assert(r.filesLoaded == 0L && t.toDF.count() == 10L,
      "path-keyed dedup skips a re-dropped changed file")
    // FORCE: every listed file loads again as a new batch
    val rf = CopyInto.run(t, src, force = true)
    assert(rf.filesLoaded == 1L && rf.rowsLoaded == 25L)
    assert(t.toDF.count() == 35L)
    // and the forced rows are now recorded: a plain re-run still no-ops
    assert(CopyInto.run(t, src).filesLoaded == 0L)
  }

  test("FILEFORMAT AVRO loads through the native avro codec") {
    val root = TestSpark.tmpDir("copyinto7")
    val src = s"$root/drop"
    val df = (0 until 30).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    graft.io.AvroIO.writeSingleFile(spark, df.filter(col("id") < 15), s"$src/a.avro")
    graft.io.AvroIO.writeSingleFile(spark, df.filter(col("id") >= 15), s"$src/b.avro")
    val t = new TxTable(spark, s"$root/t")
    t.create(Seq.empty[(Long, String)].toDF("id", "v"))
    val r = CopyInto.run(t, src, "avro")
    assert(r.filesLoaded == 2L && r.rowsLoaded == 30L)
    assert(t.toDF.select(sum(col("id"))).head().getLong(0) == (0L until 30L).sum)
    assert(CopyInto.run(t, src, "avro").filesLoaded == 0L, "avro re-run no-ops")
    // SQL surface
    val client = new graft.client.LakehouseClient(spark)
    client.createCatalog("cpav")
    client.createSchema("cpav", "s")
    client.registerAsTable("cpav", "s", "t", graft.catalog.FileType.DELTA, s"$root/t")
    graft.io.AvroIO.writeSingleFile(spark, df.limit(5), s"$src/c.avro")
    val res = spark.sql(s"COPY INTO cpav.s.t FROM '$src' FILEFORMAT = AVRO")
    assert(res.collect()(0).getLong(0) == 1L)
  }

  test("transform-at-load: FROM (SELECT ...) casts/renames/computes, replay transforms identically") {
    val root = TestSpark.tmpDir("copyinto9")
    val src = s"$root/drop"
    // raw csv: all-string columns with DIFFERENT names than the target
    (0 until 25).map(i => (i.toString, s"$i.5"))
      .toDF("raw_id", "raw_score").repartition(1)
      .write.option("header", "true").mode("append").csv(src)
    val t = new TxTable(spark, s"$root/t")
    t.create(Seq.empty[(Long, Double, Long)].toDF("id", "score", "twice"))
    val transform = Some(
      "cast(raw_id as bigint) as id, cast(raw_score as double) as score, " +
        "cast(raw_id as bigint) * 2 as twice")
    val r = CopyInto.run(t, src, "csv", transform = transform)
    assert(r.filesLoaded == 1L && r.rowsLoaded == 25L)
    val got = t.toDF.orderBy("id").collect()
    assert(got.length == 25 && got(3).getLong(0) == 3L &&
      got(3).getDouble(1) == 3.5 && got(3).getLong(2) == 6L)

    // crash window on a NEW drop: recovery (with NO transform argument)
    // must replay the RECORDED transform, not load raw columns
    (25 until 40).map(i => (i.toString, s"$i.5"))
      .toDF("raw_id", "raw_score").repartition(1)
      .write.option("header", "true").mode("append").csv(src)
    CopyInto.onIntentRecorded = () => throw new RuntimeException("boom")
    try intercept[RuntimeException] { CopyInto.run(t, src, "csv", transform = transform) }
    finally CopyInto.onIntentRecorded = () => ()
    assert(t.toDF.count() == 25L)
    val rec = CopyInto.run(t, src) // plain parquet recovery run: replays csv+transform
    assert(rec.filesLoaded == 0L)
    assert(t.toDF.count() == 40L)
    assert(t.toDF.filter(col("id") === 30L).head.getLong(2) == 60L,
      "replay must apply the recorded transform")
  }

  test("COPY_OPTIONS mergeSchema evolves the target with transformed extra columns") {
    val root = TestSpark.tmpDir("copyinto10")
    val src = s"$root/drop"
    dropFiles(src, 0 until 10)
    val client = new graft.client.LakehouseClient(spark)
    client.createCatalog("cpms")
    client.createSchema("cpms", "s")
    client.createAsTable(Seq.empty[(Long, String)].toDF("id", "v"),
      "cpms", "s", "t", graft.catalog.FileType.DELTA, s"$root/t")
    val res = spark.sql(s"""COPY INTO cpms.s.t FROM
        (SELECT id, v, id * 10 AS extra FROM '$src')
      FILEFORMAT = PARQUET COPY_OPTIONS ('mergeSchema' = 'true')""")
    assert(res.collect()(0).getLong(0) == 1L)
    val t = new TxTable(spark, s"$root/t")
    assert(t.snapshot.schema.fieldNames.toSeq == Seq("id", "v", "extra"),
      "mergeSchema must evolve the target with the transformed column")
    assert(t.toDF.filter(col("id") === 4L).head.getLong(2) == 40L)
    // without mergeSchema a surplus transformed column is projected away
    dropFiles(s"$root/drop2", 100 until 105)
    val r2 = spark.sql(s"""COPY INTO cpms.s.t FROM
        (SELECT id, v, id AS extra, id AS surplus FROM '$root/drop2')
      FILEFORMAT = PARQUET""")
    assert(r2.collect()(0).getLong(0) == 1L)
    assert(t.snapshot.schema.fieldNames.length == 3)
  }

  test("splitProjection honors nested parens and quotes") {
    assert(CopyInto.splitProjection("a, cast(b as int), concat(c, ',', d) as e") ==
      Seq("a", "cast(b as int)", "concat(c, ',', d) as e"))
    assert(CopyInto.splitProjection("f(g(x, y), z) as w") == Seq("f(g(x, y), z) as w"))
    // a backslash-escaped quote must NOT close the literal (Spark SQL
    // string rules) — before the fix the ',' after it split the expr
    assert(CopyInto.splitProjection("""concat(a, 'it\'s, fine') as x, b""") ==
      Seq("""concat(a, 'it\'s, fine') as x""", "b"))
    assert(CopyInto.splitProjection("""'a\\', b""") == Seq("""'a\\'""", "b"))
  }

  test("mergeSchema without a transform surfaces extra csv/json source columns") {
    val root = TestSpark.tmpDir("copyinto-msraw")
    Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("id", "v", "extra")
      .repartition(1).write.option("header", "true").csv(s"$root/drop")
    val t = new TxTable(spark, s"$root/t")
    t.create(Seq.empty[(Long, String)].toDF("id", "v"))
    val r = CopyInto.run(t, s"$root/drop", format = "csv", mergeSchema = true)
    assert(r.filesLoaded == 1L && r.rowsLoaded == 2L)
    // the extra column EVOLVED the target (previously the declared-
    // schema read silently dropped it despite mergeSchema=true); csv
    // headers carry no types, so it evolves as string — same contract
    // as the transform path
    assert(t.snapshot.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(t.toDF.filter(col("id") === 2L).head.getString(2) == "20")
    // known target columns still arrive CAST to their declared types
    assert(t.snapshot.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("ingest log behind the target watermark is refused, not silently skipped") {
    val root = TestSpark.tmpDir("copyinto8")
    val src = s"$root/drop"
    dropFiles(src, 0 until 10)
    val t = new TxTable(spark, s"$root/t")
    t.create(Seq.empty[(Long, String)].toDF("id", "v"))
    assert(CopyInto.run(t, src).filesLoaded == 1L)
    // simulate "someone deleted the ingest log": target remembers batch 1,
    // a fresh log would restart at batch 1 and the append would be
    // silently skipped — the run must refuse instead
    val fs = TxLog.fs(spark, src)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/t/${CopyInto.IngestRoot}"), true)
    dropFiles(src, 10 until 20)
    val e = intercept[graft.catalog.UnsupportedOperationError] { CopyInto.run(t, src) }
    assert(e.getMessage.contains("ingest"))
  }
}
