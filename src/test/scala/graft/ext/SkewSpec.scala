package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10k rows of hot key 1 + a long tail; small dimension side
  private def skewedFact = (1 to 10000).map(i => (1L, i.toLong))
    .++((2L to 50L).map(k => (k, k * 100)))
    .toDF("k", "v")
  private def dim = (1L to 50L).map(k => (k, s"name$k")).toDF("k", "name")

  test("saltedJoin inner/left match the unsalted join exactly") {
    val plain = skewedFact.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(skewedFact, dim, Seq("k"), salts = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain && plain.length == 10049)

    // left_outer keeps unmatched skewed rows exactly once
    val factPlus = skewedFact.union(Seq((999L, 0L)).toDF("k", "v"))
    val left = Skew.saltedJoin(factPlus, dim, Seq("k"), 8, "left_outer")
    assert(left.count() == 10050)
    assert(left.filter(col("k") === 999L).collect().head.isNullAt(2))
  }

  test("saltedJoin spreads a hot key across salt partitions") {
    val salted = Skew.saltedJoin(skewedFact, dim, Seq("k"), salts = 8)
    // the join key list includes the salt -> the hot key's rows shuffle to
    // multiple partitions instead of one
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt should appear in the plan:\n$plan")
  }

  test("saltedAggregate equals the direct aggregation") {
    val direct = skewedFact.groupBy("k")
      .agg(sum($"v").as("sv"), count($"v").as("n"), min($"v").as("mn"), max($"v").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted.toSeq
    val salted = Skew.saltedAggregate(skewedFact, Seq("k"), 8,
      Seq(("v", "sum", "sv"), ("v", "count", "n"), ("v", "min", "mn"), ("v", "max", "mx")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted.toSeq
    assert(salted == direct)
  }
}
