package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrequentItemsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int)
      : Map[String, (Long, Long)] =
    df.agg(FrequentItemsFunctions.spaceSavingTopK(col("item"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select("e.item", "e.est", "e.err")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("exact when distinct items fit in k counters (no evictions, err 0)") {
    val df = Seq.tabulate(300)(i => s"w${i % 7}").toDF("item").repartition(5)
    val sk = sketchOf(df, 16)
    val exact = (0 until 7).map(i => s"w$i" -> (300L / 7 + (if (i < 300 % 7) 1L else 0L))).toMap
    assert(sk.keySet == exact.keySet)
    exact.foreach { case (i, n) =>
      assert(sk(i) == ((n, 0L)), s"$i: expected exact ($n, 0), got ${sk(i)}")
    }
  }

  test("skewed stream under eviction pressure: heavy items found, bounds bracket truth") {
    // 3 hot items at 2000 each + 6000 unique cold items; k=64 → floor
    // stays <= N/k per partial, far under the hot counts
    val rows = (0 until 6000).flatMap { i =>
      Seq(s"hot${i % 3}") ++ Seq(s"cold$i")
    }
    val df = rows.toDF("item").repartition(8)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = sketchOf(df, 64)
    (0 until 3).map(i => s"hot$i").foreach { h =>
      assert(sk.contains(h), s"heavy item $h must be present")
      val (est, err) = sk(h)
      assert(est >= exact(h) && est - err <= exact(h),
        s"$h: bounds (${est - err}, $est) must bracket ${exact(h)}")
    }
    // bounds hold for EVERY reported item, not just the hot ones
    sk.foreach { case (i, (est, err)) =>
      val n = exact.getOrElse(i, 0L)
      assert(est >= n && est - err <= n, s"$i: (${est - err}, $est) vs true $n")
    }
  }

  test("merge is partitioning-insensitive on the guarantees") {
    val rows = (0 until 2000).flatMap(i => Seq(s"hot${i % 2}", s"cold$i"))
    Seq(1, 3, 13).foreach { parts =>
      val sk = sketchOf(rows.toDF("item").repartition(parts), 32)
      Seq("hot0", "hot1").foreach { h =>
        assert(sk.contains(h), s"parts=$parts: $h missing")
        val (est, err) = sk(h)
        assert(est >= 1000L && est - err <= 1000L, s"parts=$parts $h: ($est, $err)")
      }
    }
  }

  test("nulls are skipped") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("item")
    val sk = sketchOf(df, 8)
    assert(sk == Map("a" -> ((2L, 0L)), "b" -> ((1L, 0L))))
  }
}
