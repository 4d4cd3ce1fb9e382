package graft.client

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog._

/** End-to-end client flows, mirroring the reference's mini_tutorial.py and
  * write-matrix tests (SURVEY.md §2.3, FIXTURES.md §7).
  */
class LakehouseClientSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshClient(): LakehouseClient = {
    val c = new LakehouseClient(spark)
    c.createCatalog("main")
    c.createSchema("main", "default")
    c
  }

  /** Tutorial frame (reference mini_tutorial.py:8-14). */
  private def tutorialDf = Seq(
    (0L, true, 1.1), (1L, false, 2.2), (2L, true, 3.3), (3L, false, 4.4))
    .toDF("id", "filter_col", "float_col")

  test("mini_tutorial flow: csv create -> read -> filter -> delta write -> sql") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")

    // create as CSV (single file at exact path)
    c.createAsTable(tutorialDf, "main", "default", "raw", FileType.CSV, s"$dir/raw.csv")
    assert(new java.io.File(s"$dir/raw.csv").isFile)

    // read back and filter (mini_tutorial.py:42)
    val filtered = c.readTable("main", "default", "raw").filter(col("filter_col") === false)
    assert(filtered.count() == 2)

    // write filtered as DELTA table
    c.createAsTable(filtered, "main", "default", "clean", FileType.DELTA, s"$dir/clean")

    // SQL over the registered tables (mini_tutorial.py:91)
    val out = c.sql("SELECT id FROM main_default_clean WHERE filter_col = FALSE ORDER BY id")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("register_as_table infers schema from existing storage (T2)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    tutorialDf.write.parquet(s"$dir/existing")
    val t = c.registerAsTable("main", "default", "ext", FileType.PARQUET, s"$dir/existing")
    assert(t.columns.map(_.name).toSet == Set("id", "filter_col", "float_col"))
    assert(c.readTable("main", "default", "ext").count() == 4)
  }

  test("register_as_table detects hive partition columns for parquet") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    tutorialDf.withColumn("p", (col("id") % 2).cast("long"))
      .write.partitionBy("p").parquet(s"$dir/part")
    val t = c.registerAsTable("main", "default", "part", FileType.PARQUET, s"$dir/part")
    assert(t.partitionColumns == Seq("p"))
    assert(c.readTable("main", "default", "part").filter("p = 0").count() == 2)
  }

  test("write matrix guards: unsupported combinations raise (SURVEY §2.3)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    c.createAsTable(tutorialDf, "main", "default", "csvt", FileType.CSV, s"$dir/t.csv")
    c.createAsTable(tutorialDf, "main", "default", "pqt", FileType.PARQUET, s"$dir/t.parquet")

    // CSV append unsupported (dataframe.py:427-430)
    intercept[UnsupportedOperationError] {
      c.writeTable(tutorialDf, "main", "default", "csvt", WriteMode.APPEND)
    }
    // unpartitioned parquet append unsupported (dataframe.py:356-361)
    intercept[UnsupportedOperationError] {
      c.writeTable(tutorialDf, "main", "default", "pqt", WriteMode.APPEND)
    }
    // evolution=OVERWRITE requires mode=OVERWRITE (dataframe.py:300-303)
    intercept[UnsupportedOperationError] {
      c.writeTable(tutorialDf, "main", "default", "pqt", WriteMode.APPEND, SchemaEvolution.OVERWRITE)
    }
    // STRICT rejects drifted schema
    intercept[SchemaMismatchError] {
      c.writeTable(tutorialDf.withColumnRenamed("float_col", "other"),
        "main", "default", "pqt", WriteMode.OVERWRITE)
    }
  }

  test("partitioned parquet: append + dynamic partial overwrite (W5/W6)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    val part = tutorialDf.withColumn("p", (col("id") % 2).cast("long"))
    c.createAsTable(part, "main", "default", "pp", FileType.PARQUET, s"$dir/pp", Seq("p"))
    assert(c.readTable("main", "default", "pp").count() == 4)

    // append adds files without clobbering
    c.writeTable(part, "main", "default", "pp", WriteMode.APPEND)
    assert(c.readTable("main", "default", "pp").count() == 8)

    // overwrite with only partition p=0 present replaces just that partition
    val onlyP0 = Seq((100L, true, 9.9, 0L)).toDF("id", "filter_col", "float_col", "p")
    c.writeTable(onlyP0, "main", "default", "pp", WriteMode.OVERWRITE, SchemaEvolution.OVERWRITE)
    val out = c.readTable("main", "default", "pp")
    assert(out.filter("p = 0").count() == 1)  // replaced
    assert(out.filter("p = 1").count() == 4)  // survived ("DOES NOT ALWAYS OVERWRITE EVERYTHING")
  }

  test("delta write with MERGE evolution pushes evolved schema to catalog, preserving partition_index (W10)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    val part = tutorialDf.withColumn("p", (col("id") % 2).cast("long"))
    c.createAsTable(part, "main", "default", "dl", FileType.DELTA, s"$dir/dl", Seq("p"))

    // evolve: drop float_col, add more_strings (FIXTURES.md §5)
    val evolved = part.drop("float_col").withColumn("more_strings", lit("s"))
    c.writeTable(evolved, "main", "default", "dl", WriteMode.APPEND, SchemaEvolution.MERGE)

    val t = c.getTable("main", "default", "dl")
    assert(t.columns.map(_.name).contains("more_strings"))
    // partition index survives evolution (tests/test_dataframes.py:378-385)
    assert(t.partitionColumns == Seq("p"))
    assert(c.readTable("main", "default", "dl").count() == 8)
  }

  test("merge via default merge columns (M2)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    val base = Seq((0L, "a", 1.0), (1L, "b", 2.0)).toDF("id", "str_col", "float_col")
    c.createAsTable(base, "main", "default", "m", FileType.DELTA, s"$dir/m")
    // no condition + no default columns -> error
    intercept[UnsupportedOperationError] {
      c.mergeTable(base, "main", "default", "m")
    }
    c.setTableDefaultMergeColumns("main", "default", "m", Seq("id"))
    val src = Seq((1L, "B", 20.0), (2L, "c", 3.0)).toDF("id", "str_col", "float_col")
    c.mergeTable(src, "main", "default", "m")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val out = c.readTable("main", "default", "m").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((0L, "a", 1.0), (1L, "B", 20.0), (2L, "c", 3.0)))
  }

  test("avro round-trip: single-file overwrite and eager read (S5/W8)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    val df = Seq((1L, "x", BigDecimal("12345.67891")), (2L, "y", BigDecimal("2.00000")))
      .toDF("id", "s", "d")
      .withColumn("d", col("d").cast("decimal(10,5)"))
    c.createAsTable(df, "main", "default", "av", FileType.AVRO, s"$dir/t.avro")
    assert(new java.io.File(s"$dir/t.avro").isFile)
    val back = c.readTable("main", "default", "av").orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(back.map(_.getDecimal(2).toPlainString).toSeq == Seq("12345.67891", "2.00000"))
    // overwrite works, append rejected
    c.writeTable(df, "main", "default", "av", WriteMode.OVERWRITE)
    intercept[UnsupportedOperationError] {
      c.writeTable(df, "main", "default", "av", WriteMode.APPEND)
    }
  }

  test("partition_filters selective overwrite through the client (W3)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    val part = tutorialDf.withColumn("p", (col("id") % 2).cast("long"))
    c.createAsTable(part, "main", "default", "pf", FileType.DELTA, s"$dir/pf", Seq("p"))

    // overwrite only partition p = 0 via the reference's tuple syntax
    val newP0 = Seq((100L, true, 9.9, 0L)).toDF("id", "filter_col", "float_col", "p")
    c.writeTable(newP0, "main", "default", "pf", WriteMode.OVERWRITE,
      SchemaEvolution.STRICT, partitionFilters = Seq(("p", "=", "0")))
    val out = c.readTable("main", "default", "pf")
    assert(out.filter("p = 0").count() == 1)
    assert(out.filter("p = 1").count() == 2)

    // multi-op filters: p > 0 (and != on a second write)
    val newP1 = Seq((200L, false, 1.0, 1L)).toDF("id", "filter_col", "float_col", "p")
    c.writeTable(newP1, "main", "default", "pf", WriteMode.OVERWRITE,
      SchemaEvolution.STRICT, partitionFilters = Seq(("p", ">", "0")))
    assert(c.readTable("main", "default", "pf").filter("p = 1").count() == 1)

    // replace_where through the client (W4)
    val repl = Seq((100L, false, 0.0, 0L)).toDF("id", "filter_col", "float_col", "p")
    c.writeTable(repl, "main", "default", "pf", WriteMode.OVERWRITE,
      SchemaEvolution.STRICT, replaceWhere = Some("id = 100"))
    val vals = c.readTable("main", "default", "pf").filter("id = 100").collect()
    assert(vals.length == 1 && vals(0).getAs[Double]("float_col") == 0.0)
  }

  test("sql() reuses DELTA views whose log version has not moved (no re-replay)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    c.createAsTable(tutorialDf, "main", "default", "vc", FileType.DELTA, s"$dir/vc")
    assert(c.sql("SELECT COUNT(*) AS n FROM main_default_vc").collect()(0).getLong(0) == 4)

    // corrupt every commit JSON: a snapshot replay would now throw, but the
    // version (derived from filenames only) is unchanged -> cache hit
    val log = new java.io.File(s"$dir/vc/_graft_log")
    val commits = log.listFiles().filter(_.getName.endsWith(".json"))
    assert(commits.nonEmpty)
    commits.foreach(f => java.nio.file.Files.writeString(f.toPath, "not json"))
    assert(c.sql("SELECT COUNT(*) AS n FROM main_default_vc").collect()(0).getLong(0) == 4)

    // a new commit file bumps the version -> the cache must invalidate and
    // actually re-read (which fails loudly on the corrupted log)
    java.nio.file.Files.writeString(
      new java.io.File(log, "00000000000000000001.json").toPath, "not json")
    intercept[Exception] { c.sql("SELECT COUNT(*) AS n FROM main_default_vc") }
  }

  test("sync table properties from the transaction log (C19)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("client")
    c.createAsTable(tutorialDf, "main", "default", "sp", FileType.DELTA, s"$dir/sp")
    val t = c.syncTableProperties("main", "default", "sp")
    assert(t.properties("graft.table.version") == "0")
    assert(t.properties("graft.table.numFiles").toInt > 0)
  }
}
