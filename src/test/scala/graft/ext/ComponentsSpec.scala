package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Connected components over duplicate-pair edges: the labels must equal
  * a driver-side union-find ground truth on every topology that stresses
  * the star rounds — chains (multi-hop transitivity), stars, cycles,
  * disjoint groups, and a randomized graph.
  */
class ComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side union-find ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component labeled by its minimum") {
    val chain = (1L to 20L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = run(chain)
    assert(got.size == 20 && got.values.forall(_ == 1L))
  }

  test("mixed topologies: star, cycle, disjoint pairs, self-contained groups") {
    val edges = Seq(
      (10L, 11L), (10L, 12L), (10L, 13L),          // star at 10
      (20L, 21L), (21L, 22L), (22L, 20L),          // cycle
      (30L, 31L),                                   // pair
      (40L, 41L), (41L, 42L), (40L, 42L), (42L, 43L)) // dense + tail
    val got = run(edges)
    assert(got == unionFind(edges))
  }

  test("randomized graph matches union-find ground truth") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val got = run(edges)
    assert(got == unionFind(edges))
  }

  test("bridged groups merge: {A~B, B~C} is ONE component") {
    val got = run(Seq((2L, 1L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("dedupSurvivors keeps exactly one row per group plus all unpaired rows") {
    val docs = (1L to 10L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    // groups {1,2,3} (chain) and {7,8}; 4,5,6,9,10 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val kept = Components.dedupSurvivors(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 4L, 5L, 6L, 7L, 9L, 10L)))
  }

  test("string ids order lexically and label by minimum") {
    val pairs = Seq(("docB", "docA"), ("docB", "docC")).toDF("x", "y")
    val got = Components.connectedComponents(pairs, "x", "y")
      .as[(String, String)].collect().toMap
    assert(got == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA"))
  }
}
