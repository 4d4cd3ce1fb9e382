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

  test("splitAssign: exactly one split per key, ~weight fractions, deterministic") {
    import org.apache.spark.sql.functions.col
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // 50 groups x 40 rows: every row of a group must land in the group's split
    val df = spark.range(2000).selectExpr("id", "id % 50 AS grp")
    val out = Sampling.splitAssign(df, col("grp"), splits)
    val perGroup = out.groupBy("grp").agg(
      org.apache.spark.sql.functions.countDistinct("split").as("n"))
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ == 1L), "a group must never straddle splits")
    // fractions over many distinct keys approximate the weights
    val wide = Sampling.splitAssign(spark.range(20000).toDF("id"), col("id"), splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(wide("train") / 20000.0 - 0.8) < 0.03, wide.toString)
    assert(math.abs(wide("val") / 20000.0 - 0.1) < 0.03, wide.toString)
    // weights need not be pre-normalized
    val unnorm = Sampling.splitAssign(spark.range(20000).toDF("id"), col("id"),
      Seq("a" -> 8.0, "b" -> 1.0, "c" -> 1.0))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unnorm == Map("a" -> wide("train"), "b" -> wide("val"), "c" -> wide("test")))
    // repartitioning cannot move a row between splits
    val a = out.orderBy("id").collect().map(_.toString).toSeq
    val b = Sampling.splitAssign(df.repartition(7), col("grp"), splits)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("stringKey folds strings stably and feeds splitAssign") {
    import org.apache.spark.sql.functions.col
    val df = Seq("example.com", "other.org", "example.com", "").toDF("domain")
    val keys = df.select(Sampling.stringKey(col("domain")).as("k"))
      .collect().map(_.getLong(0))
    assert(keys(0) == keys(2), "same string, same key")
    assert(keys(0) != keys(1))
    assert(keys.forall(k => k >= 0 && k < 2147483648L))
    // hand-rolled 31-polynomial over code points, mod 2^31
    val expected = "example.com".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 2147483648L)
    assert(keys(0) == expected)
    assert(keys(3) == 0L, "empty string folds to the seed")
  }

  test("stringKey hashes CODE POINTS (non-ASCII and astral keys replay)") {
    import org.apache.spark.sql.functions.col
    // IDN domain (BMP multi-byte), CJK source name, emoji (astral:
    // surrogate pair in UTF-16, 4 UTF-8 bytes)
    val inputs = Seq("münchen.de", "数据集", "a😀b")
    val keys = inputs.toDF("k").select(Sampling.stringKey(col("k")).as("h"))
      .collect().map(_.getLong(0))
    // the documented engine-portable replay: fold over CODE POINTS —
    // exactly what DuckDB's unicode(c) yields per split character
    def replay(s: String): Long = {
      val cps = s.codePoints().toArray
      cps.foldLeft(0L)((a, cp) => (a * 31 + cp.toLong) % 2147483648L)
    }
    inputs.zip(keys).foreach { case (s, k) =>
      assert(k == replay(s), s"code-point replay diverged for '$s'")
    }
  }

  test("stringKeyChecked enforces the key-not-text contract") {
    import org.apache.spark.sql.functions.col
    val ok = Seq("example.com").toDF("k")
      .select(Sampling.stringKeyChecked(col("k")).as("h"))
      .collect()(0).getLong(0)
    val direct = Seq("example.com").toDF("k")
      .select(Sampling.stringKey(col("k")).as("h")).collect()(0).getLong(0)
    assert(ok == direct, "checked variant must match stringKey below the cap")
    val doc = ("lorem ipsum " * 40).trim // 479 chars > 256
    val ex = intercept[Exception] {
      Seq(doc).toDF("k").select(Sampling.stringKeyChecked(col("k")).as("h")).collect()
    }
    assert(ex.getMessage.contains("hash a key, not document text") ||
      ex.toString.contains("hash a key, not document text"))
  }
}
