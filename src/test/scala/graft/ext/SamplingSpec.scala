package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0L until 10000L).map(i => (i, if (i % 3 == 0) "en" else "xx"))
    .toDF("id", "lang")

  test("hashSample is deterministic across repartitionings and ~proportional") {
    val a = Sampling.hashSample(docs, "id", 0.2).select("id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(17), "id", 0.2).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "selection must not depend on partitioning")
    assert(math.abs(a.size - 2000) < 200, s"~20% expected, got ${a.size}")
    // nested property: a 10% sample is a subset of a 20% sample
    val c = Sampling.hashSample(docs, "id", 0.1).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a), "smaller fractions must nest inside larger ones")
  }

  test("stratifiedSample applies per-stratum fractions") {
    val out = Sampling.stratifiedSample(docs, "lang", "id",
      Map("en" -> 1.0), defaultFraction = 0.0)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"))
    assert(out.count() == docs.filter($"lang" === "en").count())
  }

  test("tokenBudgetMix keeps the in-budget prefix per stratum, matching a window oracle") {
    // 2 strata x 200 docs, varying token counts, order = id
    val d = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L + (i * 7) % 50)).toDF("id", "src", "toks")
    val budgets = Map("a" -> 500L, "b" -> 900L)
    val got = Sampling.tokenBudgetMix(d, "src", "id", "toks", budgets)
      .select("id", "cum_tokens").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // driver-side oracle: running total per stratum in id order
    val rows = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L + (i * 7) % 50))
    val want = rows.groupBy(_._2).flatMap { case (src, rs) =>
      var acc = 0L
      rs.sortBy(_._1).flatMap { case (id, _, t) =>
        acc += t
        if (acc <= budgets(src)) Some(id -> acc) else None
      }
    }.toMap
    assert(got == want)
    assert(got.nonEmpty && got.size < 400, "budget must actually cut")
  }

  test("tokenBudgetMix survives repartitioning and drops unbudgeted strata") {
    val d = (0L until 100L).map(i => (i, s"s${i % 5}", 10L)).toDF("id", "src", "toks")
    val a = Sampling.tokenBudgetMix(d, "src", "id", "toks", Map("s0" -> 100L))
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.tokenBudgetMix(d.repartition(13), "src", "id", "toks", Map("s0" -> 100L))
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b, "selection must not depend on partitioning")
    // s0 ids are 0,5,10,...; 10 tokens each, budget 100 => first 10 docs
    assert(a == (0L until 50L by 5L).toSeq)
  }

  test("epochRepeat: floor copies + hash-chosen extra, deterministic, ~expected mass") {
    val d = (0L until 2000L).map(i => (i, s"s${i % 2}")).toDF("id", "src")
    val out = Sampling.epochRepeat(d, "src", "id", Map("s0" -> 2.5, "s1" -> 0.25))
      .select("id", "src", "repeat_idx").as[(Long, String, Long)].collect()
    val s0 = out.filter(_._2 == "s0")
    val s1 = out.filter(_._2 == "s1")
    // every s0 doc appears 2 or 3 times; repeat_idx is 0..n-1
    val perDoc = s0.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(perDoc.values.forall(v => v == Seq(0L, 1L) || v == Seq(0L, 1L, 2L)))
    assert(math.abs(s0.length - 2500) < 150, s"s0 mass ${s0.length} far from 2.5x")
    // s1 docs appear at most once, ~25% of them
    assert(s1.groupBy(_._1).values.forall(_.length == 1))
    assert(math.abs(s1.length - 250) < 60, s"s1 mass ${s1.length} far from 0.25x")
    // deterministic under repartitioning
    val out2 = Sampling.epochRepeat(d.repartition(13), "src", "id",
      Map("s0" -> 2.5, "s1" -> 0.25))
      .select("id", "src", "repeat_idx").as[(Long, String, Long)].collect()
    assert(out.sortBy(r => (r._1, r._3)).toSeq == out2.sortBy(r => (r._1, r._3)).toSeq)
    // unmapped strata pass through exactly once
    val out3 = Sampling.epochRepeat(d, "src", "id", Map("s0" -> 2.0))
    assert(out3.filter(col("src") === "s1").count() == 1000L)
  }

  test("shuffleShards: exact shard sizes, a real permutation, partitioning-independent") {
    val n = 1000L
    val d = (0L until n).map(i => (i, s"doc$i")).toDF("id", "s")
    val out = Sampling.shuffleShards(d, "id", docsPerShard = 97L)
      .select("id", "shard_id", "pos_in_shard").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._2, r._3))
    // every id exactly once; every shard except the last holds exactly 97
    assert(out.map(_._1).sorted.toSeq == (0L until n).toSeq)
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    val lastShard = sizes.keys.max
    assert(sizes.filterNot(_._1 == lastShard).values.forall(_ == 97))
    assert(sizes(lastShard) == (n % 97L).toInt)
    // positions are 0..size-1 within each shard
    assert(out.groupBy(_._2).forall { case (_, rs) =>
      rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq })
    // genuinely shuffled: consecutive ids do not stay adjacent
    val posOf = out.map(r => r._1 -> (r._2 * 97 + r._3)).toMap
    val adjacent = (0L until n - 1).count(i => math.abs(posOf(i) - posOf(i + 1)) == 1)
    assert(adjacent < 20, s"suspiciously sequential: $adjacent adjacent pairs")
    // deterministic under repartitioning
    val out2 = Sampling.shuffleShards(d.repartition(17), "id", 97L)
      .select("id", "shard_id", "pos_in_shard").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._2, r._3))
    assert(out.toSeq == out2.toSeq)
  }
}
