package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Parquet-native bloom filters driven by the `graft.bloomFilter.columns`
  * table property: written into the file footers (format-spec split-block
  * blooms any parquet engine can use), only for the named columns, on all
  * three log backends.
  */
class BloomFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Columns with a bloom filter in the first data file under `loc`. */
  private def bloomColumns(loc: String, rel: String): Set[String] = {
    val in = HadoopInputFile.fromPath(new Path(loc, rel),
      spark.sessionState.newHadoopConf())
    val r = ParquetFileReader.open(in)
    try {
      r.getFooter.getBlocks.get(0).getColumns.toArray
        .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
        .filter(_.getBloomFilterOffset >= 0)
        .map(_.getPath.toDotString)
        .toSet
    } finally r.close()
  }

  test("bloom filters written for the declared columns only, native log") {
    val loc = TestSpark.tmpDir("bloom-native")
    val t = new TxTable(spark, loc)
    val df = (0L until 5000L).map(i => (i, s"u$i", i % 7)).toDF("user_id", "name", "k")
    t.create(df.repartition(1), properties = Map(
      TxLog.BloomFilterColumnsProp -> "user_id, name",
      TxLog.BloomFilterNdvProp -> "5000"))
    val file = t.snapshot.files.head
    val cols = bloomColumns(loc, file.path)
    assert(cols == Set("user_id", "name"), s"got $cols")

    // appends inherit the property from the snapshot
    t.append((5000L until 6000L).map(i => (i, s"u$i", i % 7)).toDF("user_id", "name", "k")
      .repartition(1))
    val newFile = t.snapshot.files.map(_.path).filterNot(_ == file.path).head
    assert(bloomColumns(loc, newFile) == Set("user_id", "name"))

    // point lookup still exact
    assert(t.toDF.filter(col("user_id") === 4242L).count() == 1)
  }

  test("bloom filters ride foreign Delta and Iceberg writes too") {
    val dloc = TestSpark.tmpDir("bloom-delta") + "/t"
    DeltaLogWriter.create(spark, dloc,
      (0L until 2000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1),
      properties = Map(TxLog.BloomFilterColumnsProp -> "id"))
    val dt = TxTable.forForeignDelta(spark, dloc)
    dt.append((2000L until 3000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1))
    val dFile = dt.snapshot.files.last
    assert(bloomColumns(dloc, dFile.path) == Set("id"))

    val iloc = TestSpark.tmpDir("bloom-ice") + "/t"
    IcebergWriter.create(spark, iloc,
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1),
      properties = Map(TxLog.BloomFilterColumnsProp -> "id"))
    val it = TxTable.forIceberg(spark, iloc)
    it.append((100L until 2100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1))
    val iFile = it.snapshot.files.maxBy(_.rows)
    assert(bloomColumns(iloc, iFile.path) == Set("id"))
  }

  test("no property, no bloom bytes") {
    val loc = TestSpark.tmpDir("bloom-off")
    val t = new TxTable(spark, loc)
    t.create((0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1))
    assert(bloomColumns(loc, t.snapshot.files.head.path).isEmpty)
  }
}
