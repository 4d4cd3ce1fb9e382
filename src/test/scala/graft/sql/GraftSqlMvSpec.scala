package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.FileType
import graft.client.LakehouseClient

/** CREATE MATERIALIZED VIEW ... AS SELECT / REFRESH MATERIALIZED VIEW —
  * the SQL face of IncrementalView: the view is a registered catalog
  * table, REFRESH reports its mode, and increments fold exactly.
  */
class GraftSqlMvSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("create, query, append, refresh — incremental modes and exact results") {
    val client = new LakehouseClient(spark)
    client.createCatalog("mvsql")
    client.createSchema("mvsql", "s")
    val dir = TestSpark.tmpDir("mv-sql")
    client.createAsTable(
      Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v"),
      "mvsql", "s", "src", FileType.DELTA, s"$dir/src")

    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvsql.s.v LOCATION '$dir/v' AS
         SELECT k, COUNT(*) AS n_rows, SUM(v) AS sum_v
         FROM mvsql.s.src GROUP BY k""")
    // a LONG source column keeps an exact LONG sum (no double rounding
    // past 2^53 — sums inherit the SUM result type)
    def viewRows() = spark.sql("SELECT k, n_rows, sum_v FROM mvsql.s.v ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viewRows() == Seq(("a", 2L, 3L), ("b", 1L, 10L)))

    // source grows through SQL; REFRESH reports an incremental fold
    spark.sql("INSERT INTO mvsql.s.src VALUES ('a', 4), ('c', 7)")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvsql.s.v").collect()(0)
    assert(r.getString(0) == "incremental", r.toString)
    assert(viewRows() == Seq(("a", 3L, 7L), ("b", 1L, 10L), ("c", 1L, 7L)))

    // a source DELETE forces the full re-sync path
    spark.sql("DELETE FROM mvsql.s.src WHERE k = 'b'")
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvsql.s.v").collect()(0).getString(0) == "full")
    assert(viewRows() == Seq(("a", 3L, 7L), ("c", 1L, 7L)))

    // nothing new -> noop
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvsql.s.v").collect()(0).getString(0) == "noop")
  }

  test("MIN/MAX columns fold under appends and force re-sync on deletes") {
    val client = new LakehouseClient(spark)
    client.createCatalog("mvsql3")
    client.createSchema("mvsql3", "s")
    val dir = TestSpark.tmpDir("mv-sql3")
    client.createAsTable(
      Seq(("a", 5L), ("a", 2L), ("b", 10L)).toDF("k", "v"),
      "mvsql3", "s", "src", FileType.DELTA, s"$dir/src")
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvsql3.s.v LOCATION '$dir/v' AS
         SELECT k, COUNT(*) AS n_rows, MIN(v) AS min_v, MAX(v) AS max_v
         FROM mvsql3.s.src GROUP BY k""")
    def rows() = spark.sql("SELECT k, n_rows, min_v, max_v FROM mvsql3.s.v ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows() == Seq(("a", 2L, 2L, 5L), ("b", 1L, 10L, 10L)))

    // append widens extrema incrementally (LEAST/GREATEST fold)
    spark.sql("INSERT INTO mvsql3.s.src VALUES ('a', 1), ('a', 9)")
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvsql3.s.v").collect()(0).getString(0) ==
      "incremental")
    assert(rows() == Seq(("a", 4L, 1L, 9L), ("b", 1L, 10L, 10L)))

    // deleting the current minimum needs the runner-up -> full re-sync
    spark.sql("DELETE FROM mvsql3.s.src WHERE v = 1")
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvsql3.s.v").collect()(0).getString(0) ==
      "full")
    assert(rows() == Seq(("a", 3L, 2L, 9L), ("b", 1L, 10L, 10L)))
  }

  test("APPROX_COUNT_DISTINCT columns fold sketches under appends, re-sync on deletes") {
    val client = new LakehouseClient(spark)
    client.createCatalog("mvsql4")
    client.createSchema("mvsql4", "s")
    val dir = TestSpark.tmpDir("mv-sql4")
    client.createAsTable(
      Seq(("a", "u1"), ("a", "u2"), ("a", "u1"), ("b", "u1")).toDF("k", "u"),
      "mvsql4", "s", "src", FileType.DELTA, s"$dir/src")
    spark.sql(
      s"""CREATE MATERIALIZED VIEW mvsql4.s.v LOCATION '$dir/v' AS
         SELECT k, COUNT(*) AS n_rows, APPROX_COUNT_DISTINCT(u) AS uniq_u
         FROM mvsql4.s.src GROUP BY k""")
    import graft.tables.IncrementalView
    def uniques() = IncrementalView.withDistinctEstimates(
      graft.tables.TxTable.forLocation(spark,
        client.getTable("mvsql4", "s", "v").storageLocation.get).toDF, Seq("u"))
      .select("k", "approx_uniq_u").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(uniques() == Map("a" -> 2.0, "b" -> 1.0)) // exact below k
    // overlap across batches must not double-count: u2 is old news for a
    spark.sql("INSERT INTO mvsql4.s.src VALUES ('a', 'u2'), ('a', 'u3'), ('b', 'u9')")
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvsql4.s.v").collect()(0).getString(0) ==
      "incremental")
    assert(uniques() == Map("a" -> 3.0, "b" -> 2.0))
    // a delete cannot un-insert a hash -> full re-sync, still exact
    spark.sql("DELETE FROM mvsql4.s.src WHERE u = 'u3'")
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvsql4.s.v").collect()(0).getString(0) ==
      "full")
    assert(uniques() == Map("a" -> 2.0, "b" -> 2.0))
  }

  test("mis-shapen select lists fall through to Spark's own parser error") {
    val client = new LakehouseClient(spark)
    client.createCatalog("mvsql2")
    client.createSchema("mvsql2", "s")
    val dir = TestSpark.tmpDir("mv-sql2")
    client.createAsTable(Seq(("a", 1L)).toDF("k", "v"),
      "mvsql2", "s", "src", FileType.DELTA, s"$dir/src")
    // AVG is not stored directly (it is sum/count on read): not our
    // grammar -> Spark rejects the statement (it has no MATERIALIZED
    // VIEW support of its own)
    intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW mvsql2.s.v LOCATION '$dir/v' AS
         SELECT k, COUNT(*), AVG(v) FROM mvsql2.s.src GROUP BY k"""))
    // REFRESH of a non-MV catalog table raises the typed error
    intercept[graft.catalog.UnsupportedOperationError](
      spark.sql("REFRESH MATERIALIZED VIEW mvsql2.s.src").collect())
  }
}
