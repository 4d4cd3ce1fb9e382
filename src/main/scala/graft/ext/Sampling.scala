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

  /** Membership column: keep iff hash32(id) < fraction * 2^32. */
  def keepExpr(idCol: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    pmod(idCol.cast("long") * lit(Knuth), lit(M32)) < lit((fraction * M32).toLong)
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
    df.filter(pmod(col(idCol).cast("long") * lit(Knuth), lit(M32)) <
      (frac * lit(M32.toDouble)).cast("long"))
  }
}
