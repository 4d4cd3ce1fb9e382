package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. `headline` marks queries included in the benchmark.
  *
  * Determinism conventions (so Spark and DuckDB hash-match bit-for-bit):
  *   - Floating aggregates: per-row arithmetic in DOUBLE (IEEE, identical in
  *     both engines), then `CAST(... AS DECIMAL(38,10))` before SUM — decimal
  *     sums are exact and order-independent — then CAST back to DOUBLE.
  *   - All integer outputs cast to BIGINT (Spark LongType) on both sides.
  *   - Top-k queries carry a total tie-break order.
  *   - Event timestamps are nanosecond epoch longs; all time math is integer
  *     division so Spark (ns) and DuckDB (us-truncated) agree.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Det {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  private val Dec = DecimalType(38, 10)

  /** Order-independent, engine-exact sum of a double expression. Executed
    * by the native 128-bit fixed-point aggregate (graft.functions.Sum128)
    * — value-identical to `sum(cast(c as decimal(38,10))).cast(double)`
    * (property-tested + fixture-verified in Sum128Spec) at ~4x less cost:
    * the decimal route pays a per-row double→BigDecimal conversion, the
    * fixed-point route a handful of long ops.
    */
  def dsum(c: Column): Column = graft.functions.Sum128.dsum128(c)

  /** The decimal(38,10) formulation dsum is contracted against — kept for
    * operands whose per-row |value| can exceed ~9.2e8 (dsum raises there).
    */
  def dsumDecimal(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Deterministic average: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL sides of the same helpers (DuckDB). The DECIMAL→DOUBLE cast goes
    * through VARCHAR because DuckDB's direct decimal→double conversion is
    * not correctly rounded (1-ulp error on some values), while the text
    * round-trip is — matching Spark's BigDecimal.doubleValue exactly.
    */
  def sqlSum(e: String): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
  def sqlAvg(e: String): String = s"(${sqlSum(e)} / COUNT(*))"
}
