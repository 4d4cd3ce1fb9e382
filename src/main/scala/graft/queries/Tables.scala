package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  * Plain parquet scans — filters/projections placed on top of these are
  * pushed into the scan by Catalyst (verified via .explain: PushedFilters).
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** events.parquet has shipped with two physical shapes for `ts` across
    * fixture generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * only accepts as a raw epoch-ns long via the nanosAsLong legacy flag)
    * and TIMESTAMP(MICROS). Normalize both to an epoch-nanosecond LongType
    * `ts` so every downstream query keeps doing exact integer arithmetic on
    * ns — which also agrees exactly with DuckDB's `epoch_ns(ts)` view of
    * the same column (real precision is µs in both cases, so ns = µs*1000
    * is lossless).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw // nanos-as-long fixtures
      case _ => raw.withColumn("ts",
        org.apache.spark.sql.functions.unix_micros(
          raw("ts").cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
    }
  }
}
