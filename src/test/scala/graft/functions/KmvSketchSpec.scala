package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV / theta distinct-value sketch: exact below k, ~1/sqrt(k) error
  * above it, partitioning-insensitive merge, and set algebra
  * (intersection / union / Jaccard) on planted overlaps — the property
  * HLL cannot provide.
  */
class KmvSketchSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def sketchOf(values: Seq[String], k: Int, parts: Int = 8): Array[Long] =
    values.toDF("v").repartition(parts)
      .agg(KmvFunctions.kmvSketch(col("v"), k).as("sk"))
      .collect()(0).getSeq[Long](0).toArray

  test("exact regime: fewer than k distinct values -> exact cardinality") {
    val sk = sketchOf((0 until 300).map(i => s"v$i"), k = 1024)
    assert(sk.length == 300)
    assert(KmvEstimate.cardinality(sk, 1024) == 300.0)
    // duplicates don't inflate: distinct semantics
    val sk2 = sketchOf((0 until 300).flatMap(i => Seq(s"v$i", s"v$i")), k = 1024)
    assert(KmvEstimate.cardinality(sk2, 1024) == 300.0)
  }

  test("estimate regime: 50k distinct within ~4 sigma of 1/sqrt(k)") {
    val n = 50000
    val k = 1024
    val sk = sketchOf((0 until n).map(i => s"item_$i"), k)
    assert(sk.length == k)
    val est = KmvEstimate.cardinality(sk, k)
    val rel = math.abs(est - n) / n
    assert(rel < 4.0 / math.sqrt(k - 2), s"est $est vs $n (rel $rel)")
  }

  test("merge is partitioning-insensitive: same sketch at 1 and 32 partitions") {
    val vals = (0 until 20000).map(i => s"x$i")
    val a = sketchOf(vals, k = 256, parts = 1)
    val b = sketchOf(vals, k = 256, parts = 32)
    assert(a.toSeq == b.toSeq)
  }

  test("set ops: planted overlap estimated within tolerance; disjoint -> ~0") {
    val k = 1024
    // |A| = 30000, |B| = 30000, |A ∩ B| = 15000, |A ∪ B| = 45000
    val a = sketchOf((0 until 30000).map(i => s"k$i"), k)
    val b = sketchOf((15000 until 45000).map(i => s"k$i"), k)
    val (inter, uni, jac) = KmvEstimate.setOps(a, b, k)
    assert(math.abs(inter - 15000) / 15000.0 < 0.15, s"intersection $inter")
    assert(math.abs(uni - 45000) / 45000.0 < 0.10, s"union $uni")
    assert(math.abs(jac - 1.0 / 3.0) < 0.05, s"jaccard $jac")
    // disjoint sets: intersection collapses
    val c = sketchOf((100000 until 130000).map(i => s"k$i"), k)
    val (i2, _, j2) = KmvEstimate.setOps(a, c, k)
    assert(i2 / 30000.0 < 0.01, s"disjoint intersection $i2")
    assert(j2 < 0.01)
    // exact regime pair: both small -> exact set ops
    val sa = sketchOf((0 until 100).map(i => s"s$i"), k)
    val sb = sketchOf((60 until 160).map(i => s"s$i"), k)
    val (i3, u3, j3) = KmvEstimate.setOps(sa, sb, k)
    assert(i3 == 40.0 && u3 == 160.0)
    assert(math.abs(j3 - 40.0 / 160.0) < 1e-12)
  }

  test("column API: grouped sketches + kmv_set_ops expression; nulls ignored") {
    val df = (0 until 20000).map { i =>
      val grp = if (i % 2 == 0) "a" else "b"
      // group a holds h0..h9999 (evens/2), group b h5000..h14999: overlap 5000
      val key = if (grp == "a") i / 2 else 5000 + i / 2
      (grp, s"h$key")
    }.toDF("g", "v")
      .union(Seq(("a", null.asInstanceOf[String])).toDF("g", "v"))
    val k = 512
    val sk = df.groupBy(col("g")).agg(KmvFunctions.kmvSketch(col("v"), k).as("sk"))
    val pair = sk.filter(col("g") === "a").select(col("sk").as("ska")).crossJoin(
      sk.filter(col("g") === "b").select(col("sk").as("skb")))
      .select(KmvFunctions.kmvSetOps(col("ska"), col("skb"), k).as("ops"),
        KmvFunctions.kmvCardinality(col("ska"), k).as("card_a"))
      .select(col("ops.intersection"), col("ops.union"), col("ops.jaccard"), col("card_a"))
      .collect()(0)
    assert(math.abs(pair.getDouble(0) - 5000) / 5000.0 < 0.2)
    assert(math.abs(pair.getDouble(1) - 15000) / 15000.0 < 0.12)
    assert(math.abs(pair.getDouble(2) - 1.0 / 3.0) < 0.07)
    assert(math.abs(pair.getDouble(3) - 10000) / 10000.0 < 0.15)
  }

  test("plan stays a hash aggregate with partial (map-side) combine") {
    val df = (0 until 1000).map(i => s"v$i").toDF("v")
    val agg = df.agg(KmvFunctions.kmvSketch(col("v"), 64).as("sk"))
    val plan = agg.queryExecution.executedPlan.toString
    // ObjectHashAggregate twice = partial + final; no sort-based fallback
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }
}
