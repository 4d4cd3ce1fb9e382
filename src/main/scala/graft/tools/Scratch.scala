package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.FileType
import graft.client.LakehouseClient

/** Throwaway exploration main (not part of the library surface): drives the
  * lakehouse client end-to-end through its public API.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val client = new LakehouseClient(spark)
    client.createCatalog("main")
    client.createSchema("main", "default")

    // 1. CSV landing table
    val raw = Seq((0L, true, 1.1), (1L, false, 2.2), (2L, true, 3.3), (3L, false, 4.4))
      .toDF("id", "filter_col", "float_col")
    client.createAsTable(raw, "main", "default", "raw", FileType.CSV, s"$dir/raw.csv")
    println("[demo] raw.csv is single file: " + new java.io.File(s"$dir/raw.csv").isFile)

    // 2. curate into a transactional table
    val clean = client.readTable("main", "default", "raw").filter(!col("filter_col"))
    client.createAsTable(clean, "main", "default", "clean", FileType.DELTA, s"$dir/clean")

    // 3. merge an update batch
    client.setTableDefaultMergeColumns("main", "default", "clean", Seq("id"))
    val updates = Seq((1L, false, 22.0), (9L, false, 99.0)).toDF("id", "filter_col", "float_col")
    client.mergeTable(updates, "main", "default", "clean")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()

    // 4. SQL over the catalog
    client.sql("SELECT id, float_col FROM main_default_clean ORDER BY id").show()

    // 5. time travel to before the merge
    val t = client.getTxTable("main", "default", "clean")
    println("[demo] versions: 0.." + t.version)
    println("[demo] v0 rows: " + t.toDF(0L).count() + ", current rows: " + t.toDF.count())

    // 6. replaceWhere one row
    t.replaceWhere(Seq((9L, false, 0.0)).toDF("id", "filter_col", "float_col"), "id = 9")
    client.sql("SELECT id, float_col FROM main_default_clean ORDER BY id").show()

    spark.stop()
  }
}
