package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** RangeJoin checked DIFFERENTIALLY against the naive non-equi join in
  * the same session (the authority on the range predicate's semantics),
  * on randomized data that covers the hazards: boundary points (== start,
  * == end-1, == end), intervals spanning many bins, intervals inside one
  * bin, degenerate (empty) intervals, negative values straddling bin 0
  * (where truncating division would mis-bin), and overlap pairs meeting
  * in several bins (where the ownership rule must emit exactly once).
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("pointInInterval == naive range join, including negative values and bin edges") {
    val rnd = new scala.util.Random(42)
    val w = 100L
    // points clustered around bin edges and zero; a few far outliers
    val points = (0 until 400).map { i =>
      val base = Seq(-200L, -100L, -1L, 0L, 99L, 100L, 250L, 1000L)(i % 8)
      (i.toLong, i % 5, base + rnd.nextInt(5) - 2)
    }.toDF("p_id", "k", "ts")
    val intervals = (0 until 120).map { i =>
      val s = rnd.nextInt(1400) - 400L
      // lengths from degenerate (0) through many-bin (up to 7 bins)
      val len = Seq(0L, 1L, 5L, 99L, 100L, 101L, 650L)(i % 7)
      (i.toLong, i % 5, s, s + len)
    }.toDF("i_id", "ik", "s", "e")
    val binned = RangeJoin.pointInInterval(points, intervals,
        pointCol = "ts", startCol = "s", endCol = "e", binWidth = w,
        equiKeys = Seq(("k", "ik")))
      .select(col("p_id"), col("i_id"))
    val naive = points.alias("p").join(intervals.alias("i"),
        col("p.k") === col("i.ik") && col("p.ts") >= col("i.s")
          && col("p.ts") < col("i.e"))
      .select(col("p_id"), col("i_id"))
    assert(sortedRows(binned) == sortedRows(naive))
    // and it must actually plan as an equi-join, not a nested loop
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binning must produce an equi-join plan:\n$plan")
  }

  test("intervalOverlap == naive overlap join, each pair exactly once") {
    val rnd = new scala.util.Random(7)
    val w = 50L
    def mk(n: Int, seed: Int) = (0 until n).map { i =>
      val s = rnd.nextInt(900) - 300L
      val len = Seq(1L, 10L, 49L, 50L, 51L, 240L)(i % 6)
      (i.toLong + seed * 1000L, i % 3, s, s + len)
    }
    val left = mk(90, 0).toDF("a_id", "k", "a_s", "a_e")
    val right = mk(110, 1).toDF("b_id", "bk", "b_s", "b_e")
    val binned = RangeJoin.intervalOverlap(left, right,
        leftStart = "a_s", leftEnd = "a_e", rightStart = "b_s", rightEnd = "b_e",
        binWidth = w, equiKeys = Seq(("k", "bk")))
      .select(col("a_id"), col("b_id"))
    val naive = left.alias("l").join(right.alias("r"),
        col("l.k") === col("r.bk") && col("l.a_s") < col("r.b_e")
          && col("r.b_s") < col("l.a_e"))
      .select(col("a_id"), col("b_id"))
    // exact MULTISET equality: a pair emitted in two bins would show as
    // a duplicate here, not be masked by a distinct
    assert(sortedRows(binned) == sortedRows(naive))
  }

  test("degenerate intervals match nothing; empty inputs are fine") {
    val points = Seq((1L, 5L)).toDF("p_id", "ts")
    val intervals = Seq((1L, 5L, 5L), (2L, 9L, 3L)).toDF("i_id", "s", "e")
    assert(RangeJoin.pointInInterval(points, intervals,
      "ts", "s", "e", binWidth = 10L).count() == 0L)
    val none = points.filter(lit(false))
    assert(RangeJoin.pointInInterval(none, intervals,
      "ts", "s", "e", binWidth = 10L).count() == 0L)
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "ts", "s", "e", binWidth = 0L)
    }
  }

  test("non-integral range columns are rejected, not silently mis-binned") {
    // double 100.5 in [99.0, 100.9) would truncate into bin 1 while the
    // interval replicates only through bin 0 — the match would silently
    // vanish; the operator must fail loudly instead
    val pts = Seq((1L, 100.5)).toDF("p_id", "ts")
    val ivs = Seq((1L, 99.0, 100.9)).toDF("i_id", "s", "e")
    val err = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, "ts", "s", "e", binWidth = 100L)
    }
    assert(err.getMessage.contains("integral"))
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(ivs, ivs.select(col("i_id").as("b"),
        col("s").as("bs"), col("e").as("be")), "s", "e", "bs", "be", 100L)
    }
  }

  test("an interval spanning more bins than the cap raises a planned error, not an OOM") {
    // the classic trigger: an open-ended sentinel end (Long.MaxValue-ish)
    // slipping into a binned join would explode to ~10^8 bins per row
    val points = Seq((1L, 50L)).toDF("pid", "ts")
    val sane = Seq((10L, 0L, 100L)).toDF("iid", "s", "e")
    val sentinel = Seq((11L, 0L, Long.MaxValue / 4)).toDF("iid", "s", "e")
    // sane intervals under the default cap: unaffected
    assert(RangeJoin.pointInInterval(points, sane, "ts", "s", "e", 10L)
      .count() == 1L)
    // the sentinel interval fails LOUDLY with the span in the message
    val err = intercept[Exception] {
      RangeJoin.pointInInterval(points, sentinel, "ts", "s", "e", 10L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("maxBinsPerInterval")),
      s"error must name the guard, got: ${err.getMessage}")
    // an explicitly raised cap admits the wide interval (the user owns
    // the replication factor then) — exercised at a width that keeps
    // the array small
    assert(RangeJoin.pointInInterval(points,
        Seq((12L, 0L, 2000000L)).toDF("iid", "s", "e"),
        "ts", "s", "e", 10L, maxBinsPerInterval = 300000L).count() == 1L)
    // same guard on the overlap shape
    val err2 = intercept[Exception] {
      RangeJoin.intervalOverlap(sane, sentinel, "s", "e", "s", "e", 10L).count()
    }
    assert(msgs(err2).exists(m => m != null && m.contains("maxBinsPerInterval")))
  }

  test("self-lineage inputs (same parent table) resolve unambiguously") {
    val base = Seq((1L, 10L), (2L, 15L), (3L, 40L)).toDF("id", "t")
    val pts = base.select(col("id").as("p_id"), col("t"))
    val ivs = base.select(col("id").as("i_id"), col("t").as("s"),
      (col("t") + 10L).as("e"))
    val got = RangeJoin.pointInInterval(pts, ivs, "t", "s", "e", binWidth = 8L)
      .select(col("p_id"), col("i_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // 10∈[10,20) and 15∈[10,20); 15∈[15,25); 40∈[40,50)
    assert(got == Seq((1L, 1L), (2L, 1L), (2L, 2L), (3L, 3L)))
  }
}
