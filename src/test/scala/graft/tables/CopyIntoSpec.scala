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
        .withColumn("batch", lit(2L)),
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
}
