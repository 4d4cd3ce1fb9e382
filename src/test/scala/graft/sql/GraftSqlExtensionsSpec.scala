package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.FileType
import graft.client.LakehouseClient

class GraftSqlExtensionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("3-part names resolve through the graft catalog in spark.sql") {
    val client = new LakehouseClient(spark)
    client.createCatalog("lake")
    client.createSchema("lake", "core")
    val dir = TestSpark.tmpDir("sqlext")
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    client.createAsTable(df, "lake", "core", "items", FileType.DELTA, s"$dir/items")
    client.createAsTable(df.filter($"id" > 1), "lake", "core", "sub", FileType.PARQUET, s"$dir/sub.parquet")

    // plain select over the transactional table
    val r1 = spark.sql("SELECT id, v FROM lake.core.items WHERE id >= 2 ORDER BY id").collect()
    assert(r1.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((2L, 20.0), (3L, 30.0)))

    // join across two 3-part tables of different formats
    val r2 = spark.sql("""SELECT a.id, a.name FROM lake.core.items a
        JOIN lake.core.sub b ON a.id = b.id ORDER BY a.id""").collect()
    assert(r2.map(_.getLong(0)).toSeq == Seq(2L, 3L))

    // unknown table still raises Spark's normal error
    intercept[Exception] { spark.sql("SELECT * FROM lake.core.missing").collect() }
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF on 3-part names") {
    val client = new LakehouseClient(spark)
    client.createCatalog("lake3")
    client.createSchema("lake3", "core")
    val dir = TestSpark.tmpDir("sqltravel")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    client.createAsTable(df, "lake3", "core", "t", FileType.DELTA, s"$dir/t") // v0
    val afterCreate = System.currentTimeMillis()
    Thread.sleep(5)
    client.writeTable(Seq((3L, "c")).toDF("id", "v"), "lake3", "core", "t",
      graft.catalog.WriteMode.APPEND) // v1

    assert(spark.sql("SELECT COUNT(*) FROM lake3.core.t").collect()(0).getLong(0) == 3)
    assert(spark.sql("SELECT COUNT(*) FROM lake3.core.t VERSION AS OF 0")
      .collect()(0).getLong(0) == 2)
    val ts = new java.sql.Timestamp(afterCreate).toString
    assert(spark.sql(s"SELECT COUNT(*) FROM lake3.core.t TIMESTAMP AS OF '$ts'")
      .collect()(0).getLong(0) == 2)

    // iceberg tables travel by metadata version through the same syntax
    client.createAsTable(df, "lake3", "core", "ice", FileType.ICEBERG, s"$dir/ice")
    client.writeTable(Seq((3L, "c")).toDF("id", "v"), "lake3", "core", "ice",
      graft.catalog.WriteMode.APPEND)
    assert(spark.sql("SELECT COUNT(*) FROM lake3.core.ice VERSION AS OF 1")
      .collect()(0).getLong(0) == 2)
    assert(spark.sql("SELECT COUNT(*) FROM lake3.core.ice").collect()(0).getLong(0) == 3)

    // non-transactional formats refuse with a typed error
    client.createAsTable(df, "lake3", "core", "p", FileType.PARQUET, s"$dir/p.parquet")
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM lake3.core.p VERSION AS OF 0").collect()
    }
    assert(ex.getMessage.contains("transactional") || ex.toString.contains("transactional"))
  }

  test("merge results visible via SQL immediately (no view re-registration)") {
    val client = new LakehouseClient(spark)
    client.createCatalog("lake2")
    client.createSchema("lake2", "core")
    val dir = TestSpark.tmpDir("sqlext2")
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    client.createAsTable(df, "lake2", "core", "t", FileType.DELTA, s"$dir/t")
    client.getTxTable("lake2", "core", "t")
      .merge(Seq((2L, 20.0), (3L, 30.0)).toDF("id", "v"), "s.id = t.id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val out = spark.sql("SELECT v FROM lake2.core.t ORDER BY id").collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(1.0, 20.0, 30.0))
  }
}
