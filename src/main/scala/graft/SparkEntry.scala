package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator; `oracleSql` the
  * DuckDB-equivalent SQL for each SQL-expressible one. Column names and
  * value determinism conventions are documented in
  * graft/queries/QueryDef.scala.
  */
object SparkEntry {

  /** Full registry of verifiable operators. */
  val allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ EventQueries.defs ++ TextQueries.defs ++
      EmbeddingQueries.defs ++ ExtQueries.defs ++ MoreQueries.defs ++
      InteropQueries.defs ++ MultimodalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Queries included in the benchmark run (graft.Bench). */
  def headlineQueries: Seq[QueryDef] = allDefs.filter(_.headline)
}
