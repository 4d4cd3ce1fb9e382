package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.FileType
import graft.client.LakehouseClient

/** CREATE TABLE tgt [SHALLOW|DEEP] CLONE src [VERSION AS OF n] LOCATION
  * '...' on 3-part catalog names — the SQL face of TxTable.cloneTo, with
  * the clone registered as a new catalog table.
  */
class CloneSqlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SHALLOW CLONE forks a catalog Delta table; histories diverge") {
    val client = new LakehouseClient(spark)
    client.createCatalog("clsql")
    client.createSchema("clsql", "s")
    val dir = TestSpark.tmpDir("clone-sql")
    client.createAsTable(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"),
      "clsql", "s", "src", FileType.DELTA, s"$dir/src")
    spark.sql("INSERT INTO clsql.s.src VALUES (4, 'd')")

    spark.sql(s"CREATE TABLE clsql.s.c SHALLOW CLONE clsql.s.src LOCATION '$dir/c'")
    assert(spark.sql("SELECT COUNT(*) FROM clsql.s.c").collect()(0).getLong(0) == 4)
    // divergence both ways
    spark.sql("DELETE FROM clsql.s.src WHERE id = 1")
    spark.sql("INSERT INTO clsql.s.c VALUES (9, 'z')")
    assert(spark.sql("SELECT COUNT(*) FROM clsql.s.src").collect()(0).getLong(0) == 3)
    assert(spark.sql("SELECT id FROM clsql.s.c ORDER BY id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L, 4L, 9L))
  }

  test("CLONE accepts backtick-quoted identifiers (source resolved at execution too)") {
    val client = new LakehouseClient(spark)
    client.createCatalog("clsql3")
    client.createSchema("clsql3", "s")
    val dir = TestSpark.tmpDir("clone-sql3")
    client.createAsTable(
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      "clsql3", "s", "src", FileType.DELTA, s"$dir/src")
    // backticked SOURCE: the command body must resolve the stripped name
    // parts at execution time, not the raw backticked ones
    spark.sql(
      s"CREATE TABLE `clsql3`.`s`.`c` SHALLOW CLONE `clsql3`.`s`.`src` LOCATION '$dir/c'")
    assert(spark.sql("SELECT COUNT(*) FROM clsql3.s.c").collect()(0).getLong(0) == 2)
  }

  test("SHALLOW CLONE forks a catalog ICEBERG table; histories diverge") {
    val client = new LakehouseClient(spark)
    client.createCatalog("clice")
    client.createSchema("clice", "s")
    val dir = TestSpark.tmpDir("clone-sql-ice")
    client.createAsTable(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"),
      "clice", "s", "src", FileType.ICEBERG, s"$dir/src")
    spark.sql("INSERT INTO clice.s.src VALUES (4, 'd')")

    spark.sql(s"CREATE TABLE clice.s.c SHALLOW CLONE clice.s.src LOCATION '$dir/c'")
    assert(client.getTable("clice", "s", "c").fileType == FileType.ICEBERG)
    assert(spark.sql("SELECT COUNT(*) FROM clice.s.c").collect()(0).getLong(0) == 4)
    // divergence both ways — the clone's Iceberg log is its own
    spark.sql("DELETE FROM clice.s.src WHERE id = 1")
    spark.sql("INSERT INTO clice.s.c VALUES (9, 'z')")
    assert(spark.sql("SELECT COUNT(*) FROM clice.s.src").collect()(0).getLong(0) == 3)
    assert(spark.sql("SELECT id FROM clice.s.c ORDER BY id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L, 4L, 9L))
  }

  test("CLONE VERSION AS OF pins the source's earlier state") {
    val client = new LakehouseClient(spark)
    client.createCatalog("clsql2")
    client.createSchema("clsql2", "s")
    val dir = TestSpark.tmpDir("clone-sql2")
    client.createAsTable(
      Seq((1L, "a")).toDF("id", "name"),
      "clsql2", "s", "src", FileType.DELTA, s"$dir/src")     // v0
    spark.sql("INSERT INTO clsql2.s.src VALUES (2, 'b')")    // v1
    spark.sql(
      s"CREATE TABLE clsql2.s.c0 DEEP CLONE clsql2.s.src VERSION AS OF 0 LOCATION '$dir/c0'")
    assert(spark.sql("SELECT id FROM clsql2.s.c0").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
