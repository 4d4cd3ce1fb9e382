package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Manual skew mitigation for the cases AQE's runtime skew-join split
  * does not cover (AQE only rewrites sort-merge joins whose runtime stats
  * it sees; broadcast-ineligible hot-key joins and skewed aggregations on
  * a first pass have no such hook).
  *
  * Salting shape: the SKEWED side gets a deterministic salt in [0, salts)
  * derived from a hash of the whole row, splitting each hot key across
  * `salts` shuffle partitions; the OTHER side is replicated once per salt
  * value. Join keys become (keys..., salt), so results are exactly those
  * of the unsalted join — each other-row copy meets only its salt's slice.
  * Cost: other-side × salts replication, so size the salt count to the
  * skew, not to the cluster.
  */
object Skew {

  /** Equi-join `skewed ⋈ other` on `keys`, salted `salts` ways.
    * Supported joinType: inner / left_outer (the skewed side must be the
    * preserved side — every skewed row appears exactly once per match,
    * and unmatched rows once with nulls under left_outer).
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left_outer, not $joinType")
    // salt from a hash of ALL columns: deterministic, and spreads rows of
    // the same hot key (hashing only the keys would keep them together)
    val saltedL = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(salts)).cast(IntegerType))
    val saltedR = other
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast(IntegerType))
    saltedL.join(saltedR, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate by (keys, salt),
    * then final-aggregate the partials by keys. `partialAggs` must be
    * re-aggregatable (sum/count→sum, min→min, max→max) — the caller maps
    * each output column to the function that merges partials.
    *
    * Spark's hash aggregate already does map-side partials, but a single
    * hot key still funnels all its partials into ONE reducer; the salt
    * spreads that final combine across `salts` reducers first.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      aggs: Seq[(String, String, String)]): DataFrame = { // (inputCol, fn, outName)
    require(salts > 0, "salts must be positive")
    val supported = Set("sum", "count", "min", "max")
    aggs.foreach { case (_, fn, _) => require(supported.contains(fn), s"unsupported agg $fn") }
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)).cast(IntegerType))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head match { case (c, fn, out) => partialExpr(c, fn).as(s"__p_$out") },
        aggs.tail.map { case (c, fn, out) => partialExpr(c, fn).as(s"__p_$out") }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(
        aggs.head match { case (_, fn, out) => mergeExpr(s"__p_$out", fn).as(out) },
        aggs.tail.map { case (_, fn, out) => mergeExpr(s"__p_$out", fn).as(out) }: _*)
  }

  private def partialExpr(c: String, fn: String) = fn match {
    case "sum" => sum(col(c))
    case "count" => count(col(c))
    case "min" => min(col(c))
    case "max" => max(col(c))
  }

  private def mergeExpr(c: String, fn: String) = fn match {
    case "sum" | "count" => sum(col(c))
    case "min" => min(col(c))
    case "max" => max(col(c))
  }
}
