package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Unlike
  * `df.sample` (seeded per-partition RNG: resampling after a repartition
  * changes the selection), these operators decide membership from a
  * multiplicative hash of a STABLE id — the same rows are selected on any
  * cluster, any partitioning, any engine, which is what makes dataset
  * mixes reproducible and auditable.
  *
  * Hash: Knuth's multiplicative constant mod 2^32 scales the id into a
  * uniform 32-bit value; a row is kept when that value falls below
  * fraction * 2^32. Pure integer arithmetic — exactly reproducible in
  * SQL on any engine.
  */
object Sampling {

  private val Knuth = 2654435761L
  private val M32 = 4294967296L // 2^32
  private val M31 = 2147483648L // 2^31

  /** id folded to [0, 2^31) BEFORE the multiply: (2^31-1) * Knuth stays
    * under 2^63, so the arithmetic is overflow-free on every engine —
    * relying on silent Long wraparound would error on engines that check
    * BIGINT overflow (DuckDB) and diverge on ones that widen.
    */
  private def hash32(idCol: Column): Column =
    pmod(pmod(idCol.cast("long"), lit(M31)) * lit(Knuth), lit(M32))

  /** Membership column: keep iff hash32(id) < fraction * 2^32. */
  def keepExpr(idCol: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    hash32(idCol) < lit((fraction * M32).toLong)
  }

  /** Uniform deterministic sample of ~`fraction` of rows by stable id. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(keepExpr(col(idCol), fraction))

  /** Stratified deterministic sample: per-stratum fractions (missing
    * strata default to `defaultFraction`). The standard "dataset mixture"
    * primitive — e.g. keep 100% of high-quality sources, 10% of crawl.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(hash32(col(idCol)) < floor(frac * lit(M32.toDouble)).cast("long"))
  }
}
