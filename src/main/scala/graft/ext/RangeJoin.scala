package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins that survive 100 TB: Spark's own planner turns a
  * non-equi range predicate (`p.ts BETWEEN i.start AND i.end`) into a
  * BroadcastNestedLoopJoin — O(points × intervals) work that is fine at
  * a few thousand rows and unrunnable at cluster scale. The classic fix
  * is BINNING: quantize the range dimension into fixed-width bins so
  * the range predicate becomes an EQUI-join on the bin key (plus the
  * exact residual filter), which Spark executes as an ordinary shuffled
  * hash/sort-merge join — partial-aggregatable, AQE-skew-splittable,
  * linear in data.
  *
  * The same pattern ships in production engines as "binned range join"
  * (the Databricks range-join hint, Apache Sedona's grid-partitioned
  * spatial join); this is an independent implementation over public
  * Spark APIs.
  *
  * Two shapes:
  *  - [[pointInInterval]]: points × intervals, point ∈ [start, end).
  *    Each interval replicates to its covered bins, each point maps to
  *    exactly ONE bin, so a matching pair meets in exactly one bin —
  *    no dedup pass is needed and the join output is exact.
  *  - [[intervalOverlap]]: intervals × intervals, overlap =
  *    `s1 < e2 AND s2 < e1` (half-open). Both sides replicate, so a
  *    pair can meet in MANY bins; the join emits it only in the bin
  *    owning max(s1, s2) (the first bin both replications share) —
  *    dedup by arithmetic, not by an extra distinct shuffle.
  *
  * Picking `binWidth`: ~the typical interval length. Too small
  * multiplies the interval side's replication (ceil(len/width)+1 rows
  * per interval); too large puts many non-matching pairs in one bin
  * and shifts work to the residual filter. Both costs are linear and
  * map-side; the replication is an explicit explode, so it is visible
  * in any plan audit.
  */
object RangeJoin {

  private val Bin = "__rj_bin"

  /** Replication cap: an interval spanning more bins than this raises a
    * PLANNED error (with the offending span in the message) instead of
    * materializing a multi-million-element array per row and dying as an
    * executor OOM mid-shuffle. The classic trigger is a sentinel
    * open-ended interval (`end = Long.MaxValue`) slipping into a binned
    * join — at binWidth = 1 day in micros that is ~10^8 bins PER ROW.
    * 65536 bins ≈ 180 years of day-wide bins: generous for real
    * intervals, far below the OOM regime. Raise it explicitly per call
    * if a domain genuinely has longer spans (the cost is linear and
    * map-side, but it is YOUR replication factor to own).
    */
  val DefaultMaxBinsPerInterval: Long = 65536L

  /** `points ⋈ intervals ON equiKeys AND point ∈ [start, end)` as a
    * binned equi-join. Range columns must be integral (epoch
    * micros/nanos, day numbers — quantize floats yourself: binning IS a
    * quantization, and float bin edges would double-count boundaries).
    * Both inputs are aliased internally, so `points` and `intervals`
    * may share lineage (a self-join on the same table resolves
    * unambiguously); reference output columns by name.
    *
    * @param equiKeys (pointCol, intervalCol) pairs joined exactly —
    *                 user_id, tenant — which also co-partition the
    *                 shuffle so bins only collide within a key.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String, binWidth: Long,
      equiKeys: Seq[(String, String)] = Seq.empty,
      maxBinsPerInterval: Long = DefaultMaxBinsPerInterval): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    require(!points.columns.contains(Bin) && !intervals.columns.contains(Bin),
      s"$Bin is reserved by RangeJoin")
    requireIntegral(points, Seq(pointCol))
    requireIntegral(intervals, Seq(startCol, endCol))
    val p = points
      .withColumn(Bin, floorDiv(col(pointCol), binWidth)).alias("__rj_pt")
    val i = intervals
      // a degenerate interval (end <= start) matches nothing: half-open
      .filter(col(endCol) > col(startCol))
      // end is EXCLUSIVE: the last candidate bin holds end-1 (an
      // interval ending exactly on a bin edge does not reach into
      // the next bin)
      .withColumn(Bin, explode(binRange(
        floorDiv(col(startCol), binWidth),
        floorDiv(col(endCol) - lit(1L), binWidth), maxBinsPerInterval)))
      .alias("__rj_iv")
    def pc(n: String) = col(s"__rj_pt.$n")
    def ic(n: String) = col(s"__rj_iv.$n")
    val joinCond = (equiKeys.map { case (a, b) => pc(a) === ic(b) } :+
      (pc(Bin) === ic(Bin)) :+
      (pc(pointCol) >= ic(startCol)) :+
      (pc(pointCol) < ic(endCol))).reduce(_ && _)
    p.join(i, joinCond).drop(Bin)
  }

  /** `left ⋈ right ON equiKeys AND [s1,e1) overlaps [s2,e2)` as a
    * binned equi-join, deduped arithmetically: a pair overlaps iff
    * `s1 < e2 AND s2 < e1`, and is emitted only in bin
    * `floor(max(s1,s2) / width)` — inside both intervals' bin ranges
    * and the first bin they share — so each overlapping pair appears
    * exactly once. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String, rightStart: String, rightEnd: String,
      binWidth: Long, equiKeys: Seq[(String, String)] = Seq.empty,
      maxBinsPerInterval: Long = DefaultMaxBinsPerInterval): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    require(!left.columns.contains(Bin) && !right.columns.contains(Bin),
      s"$Bin is reserved by RangeJoin")
    requireIntegral(left, Seq(leftStart, leftEnd))
    requireIntegral(right, Seq(rightStart, rightEnd))
    def binned(df: DataFrame, s: String, e: String, tag: String): DataFrame = df
      .filter(col(e) > col(s))
      .withColumn(Bin, explode(binRange(
        floorDiv(col(s), binWidth), floorDiv(col(e) - lit(1L), binWidth),
        maxBinsPerInterval)))
      .alias(tag)
    val l = binned(left, leftStart, leftEnd, "__rj_l")
    val r = binned(right, rightStart, rightEnd, "__rj_r")
    def lc(n: String) = col(s"__rj_l.$n")
    def rc(n: String) = col(s"__rj_r.$n")
    val joinCond = (equiKeys.map { case (a, b) => lc(a) === rc(b) } :+
      (lc(Bin) === rc(Bin)) :+
      (lc(leftStart) < rc(rightEnd)) :+
      (rc(rightStart) < lc(leftEnd)) :+
      (lc(Bin) === floorDiv(greatest(lc(leftStart), rc(rightStart)), binWidth))
    ).reduce(_ && _)
    l.join(r, joinCond).drop(Bin)
  }

  /** The bin array [lo, hi] for one interval, guarded: a span wider than
    * `maxBins` raises a planned, per-row-diagnosable error BEFORE the
    * array materializes. sequence() itself would either OOM the executor
    * (huge but under Spark's element cap) or throw Spark's generic
    * "too many elements" — neither names the row or the fix.
    */
  private def binRange(lo: Column, hi: Column, maxBins: Long): Column =
    when(hi - lo < lit(maxBins), sequence(lo, hi))
      .otherwise(raise_error(concat(
        lit("RangeJoin: one interval spans "), (hi - lo + lit(1L)).cast("string"),
        lit(s" bins (> maxBinsPerInterval=$maxBins): likely an open-ended " +
          "sentinel end value; clamp the interval or raise maxBinsPerInterval " +
          "explicitly — replication is linear in bins-per-interval"))))

  /** Math.floorDiv as exact LONG column arithmetic — `a / b` on longs
    * returns a double (unsafe past 2^53: epoch NANOS corrupt), and
    * Spark's `div` truncates toward zero (bins [-w,-1) with [0,w) for
    * pre-1970 epochs). pmod gives the floor remainder; the difference
    * is exactly divisible, so IntegralDivide's truncation IS the floor,
    * with every step in 64-bit integers.
    *
    * Domain: `a > Long.MinValue + w`. The floor-remainder subtraction
    * `a - pmod(a, w)` wraps (non-ANSI long arithmetic) for values within
    * one binWidth of Long.MinValue, mis-binning such extremes. Every
    * practical quantized dimension (epoch micros/nanos, day numbers)
    * sits ~2^63 away from that edge; a domain that genuinely uses
    * Long.MinValue as a sentinel must clamp it before binning (see
    * maxBinsPerInterval — such sentinels trip that guard first anyway).
    */
  /** Range columns must be INTEGRAL — a float/timestamp would silently
    * drop matches: floorDiv casts to long, so a point like 100.5 in
    * [99.0, 100.9) truncates into bin 1 while the interval replicates
    * only through floor(100.9 - 1) = bin 0, and the pair never meets.
    * Failing loudly beats a silently incomplete join; quantize
    * non-integral dimensions to long (epoch micros, day numbers)
    * yourself — that quantization IS the binning contract. */
  private def requireIntegral(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach { c =>
      import org.apache.spark.sql.types._
      val dt = df.schema(c).dataType
      val integral = dt == ByteType || dt == ShortType ||
        dt == IntegerType || dt == LongType
      require(integral,
        s"RangeJoin range column $c must be an integral type, got " +
          s"${dt.simpleString}: quantize it to long first (epoch micros, " +
          "day numbers) — truncating bin edges would silently drop matches")
    }

  private def floorDiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}
    import org.apache.spark.sql.catalyst.expressions.{EvalMode, IntegralDivide, Literal}
    val a = c.cast("long")
    toCol(IntegralDivide(toExpr(a - pmod(a, lit(w))), Literal(w), EvalMode.LEGACY))
  }
}
