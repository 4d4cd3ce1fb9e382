package graft.client

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog._

/** The reference's workhorse round-trip oracle (SURVEY §5.3, FIXTURES §1):
  * write the random_df schema through every format, read back, compare —
  * including an independent bypass-layer re-read through raw Spark.
  */
class RoundTripSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** FIXTURES §1: id uuid-string, ints long, floats double,
    * decimals decimal(10,5), strings.
    */
  private def randomDf = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("ints", LongType, nullable = false),
      StructField("floats", DoubleType, nullable = false),
      StructField("decimals", DecimalType(10, 5), nullable = false),
      StructField("strings", StringType, nullable = false)))
    val rnd = new scala.util.Random(42)
    val rows = (0 until 10).map { i =>
      Row(java.util.UUID.nameUUIDFromBytes(Array(i.toByte)).toString,
        rnd.nextLong().abs % 10000,
        rnd.nextDouble() * 10000,
        new java.math.BigDecimal(s"${rnd.nextInt(99999)}.${10000 + rnd.nextInt(89999)}"),
        rnd.alphanumeric.take(2 + rnd.nextInt(50)).mkString)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  private def freshClient(): LakehouseClient = {
    val c = new LakehouseClient(spark)
    c.createCatalog("rt")
    c.createSchema("rt", "s")
    c
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("id").collect().toSeq.map(_.toSeq)

  test("random_df round-trips through DELTA, PARQUET, CSV, AVRO (write -> read equality)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("rt")
    val df = randomDf
    val expected = sortedRows(df)

    for ((ft, loc) <- Seq(
        (FileType.DELTA, s"$dir/t_delta"),
        (FileType.PARQUET, s"$dir/t.parquet"),
        (FileType.CSV, s"$dir/t.csv"),
        (FileType.AVRO, s"$dir/t.avro"))) {
      c.createAsTable(df, "rt", "s", s"t_$ft", ft, loc)
      val back = c.readTable("rt", "s", s"t_$ft")
      assert(graft.types.SchemaEquality.equal(df.schema, back.schema), s"$ft schema drift")
      assert(sortedRows(back) == expected, s"$ft round-trip mismatch")
    }
  }

  test("JSON and ORC round-trip (exceeding reference parity - S6)") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("rt")
    val df = randomDf
    val expected = sortedRows(df)
    for ((ft, loc) <- Seq((FileType.JSON, s"$dir/t.json"), (FileType.ORC, s"$dir/t.orc"))) {
      c.createAsTable(df, "rt", "s", s"t_$ft", ft, loc)
      assert(new java.io.File(loc).isFile, s"$ft should be a single file")
      val back = c.readTable("rt", "s", s"t_$ft")
      assert(sortedRows(back) == expected, s"$ft round-trip mismatch")
    }
  }

  test("sketch expressions are SQL-callable after registration") {
    graft.functions.SketchFunctions.registerAll(spark)
    val sim = spark.sql("SELECT simhash64(array('spark', 'query', 'engine')) AS h").collect()(0).getLong(0)
    val sim2 = spark.sql("SELECT simhash64(array('spark', 'query', 'engine')) AS h").collect()(0).getLong(0)
    assert(sim == sim2 && sim != 0L)
    val dot = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)
    val sig = spark.sql("SELECT minhash_sig(array('a b c', 'b c d'), 16) AS s").collect()(0).getSeq[Long](0)
    assert(sig.length == 16)
    // generator expression: LATERAL VIEW-style table function in SQL
    val cls = spark.sql(
      "SELECT c.* FROM (SELECT 'good clean text here' AS t) LATERAL VIEW classifier_score(t) c")
      .collect()(0)
    assert(cls.getLong(0) == 4L, "n_tokens")
    assert(cls.getBoolean(3) == (cls.getLong(1) > 0L), "keep <=> raw_score > 0")
  }

  test("bypass-layer cross-check: catalog-written parquet readable by raw Spark") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("rt")
    val df = randomDf
    c.createAsTable(df, "rt", "s", "raw", FileType.PARQUET, s"$dir/raw.parquet")
    val raw = spark.read.parquet(s"$dir/raw.parquet")
    assert(sortedRows(raw) == sortedRows(df))
  }

  test("iceberg is a first-class catalog format: create/append/overwrite/register") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("rt")
    val df = randomDf
    // create_as_table partitioned + read back through the catalog
    c.createAsTable(df, "rt", "s", "ice", FileType.ICEBERG, s"$dir/ice",
      partitionColumns = Seq("strings"))
    assert(sortedRows(c.readTable("rt", "s", "ice")) == sortedRows(df))
    // append (STRICT) doubles the rows
    c.writeTable(df.withColumn("id", concat(col("id"), lit("_2"))), "rt", "s", "ice",
      WriteMode.APPEND)
    assert(c.readTable("rt", "s", "ice").count() == 20)
    // overwrite replaces contents
    c.writeTable(df, "rt", "s", "ice", WriteMode.OVERWRITE)
    assert(sortedRows(c.readTable("rt", "s", "ice")) == sortedRows(df))
    // register the same storage as a second catalog entry, partition
    // columns inferred from the spec
    val reg = c.registerAsTable("rt", "s", "ice2", FileType.ICEBERG, s"$dir/ice")
    assert(reg.columns.filter(_.partitionIndex.isDefined).map(_.name) == Seq("strings"))
    assert(sortedRows(c.readTable("rt", "s", "ice2")) == sortedRows(df))
    // MERGE evolution lands through the TxTable surface: the new column
    // evolves in (id-preserving), old rows read it as null, and the
    // catalog schema reconciles
    c.writeTable(df.withColumn("extra", lit(1)), "rt", "s", "ice",
      WriteMode.APPEND, SchemaEvolution.MERGE)
    val evolved = c.readTable("rt", "s", "ice")
    assert(evolved.count() == 20)
    assert(evolved.filter(col("extra").isNull).count() == 10)
    assert(c.getTable("rt", "s", "ice").columns.map(_.name).contains("extra"))
    // replaceWhere swaps one slice through the same surface
    val slice = df.filter(col("strings") === "s0").withColumn("extra", lit(2))
    c.writeTable(slice, "rt", "s", "ice", WriteMode.OVERWRITE,
      replaceWhere = Some("strings = 's0'"))
    val after = c.readTable("rt", "s", "ice")
    assert(after.filter(col("extra") === 2).count() == slice.count())
    assert(after.count() == 20 - slice.count())
  }

  test("delta round-trip preserves decimals exactly across append + merge") {
    val c = freshClient()
    val dir = TestSpark.tmpDir("rt")
    val df = randomDf
    c.createAsTable(df, "rt", "s", "d", FileType.DELTA, s"$dir/d")
    c.writeTable(df.withColumn("id", concat(col("id"), lit("_2"))), "rt", "s", "d", WriteMode.APPEND)
    val back = c.readTable("rt", "s", "d")
    assert(back.count() == 20)
    val decs = back.select("decimals").collect().map(_.getDecimal(0).toPlainString).toSet
    val origDecs = df.select("decimals").collect().map(_.getDecimal(0).toPlainString).toSet
    assert(decs == origDecs)
  }
}
