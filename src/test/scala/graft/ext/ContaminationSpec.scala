package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom-prefiltered contamination joins: results must equal the exact
  * semi/anti joins (no false negatives ⇒ the prefilter is
  * result-transparent), and the probe must prune definitely-clean rows
  * before the join.
  */
class ContaminationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = (1 to 1000).map(i => (i.toLong, s"doc-$i")).toDF("id", "k")
  // every 13th doc is "benchmark" (77 keys), plus keys absent from corpus
  private def eval = ((1 to 1000 by 13).map(i => s"doc-$i") ++ Seq("ghost-a", "ghost-b"))
    .toDF("ek")

  test("bloomSemiJoin equals the exact left_semi join") {
    val got = Contamination.bloomSemiJoin(corpus, "k", eval, "ek")
      .select("id").as[Long].collect().sorted
    val want = corpus.join(eval, col("k") === col("ek"), "left_semi")
      .select("id").as[Long].collect().sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("bloomAntiJoin equals the exact left_anti join") {
    val got = Contamination.bloomAntiJoin(corpus, "k", eval, "ek")
      .select("id").as[Long].collect().sorted
    val want = corpus.join(eval, col("k") === col("ek"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.length == want.length && got.sameElements(want))
    assert(got.length + (1 to 1000 by 13).size == 1000)
  }

  test("probe column: no false negatives; false-positive rate near fpp") {
    val bloom = Contamination.buildBloom(eval, "ek", fpp = 0.01)
    // every eval key must probe true
    val misses = eval.filter(!Contamination.mightContain(bloom, col("ek"))).count()
    assert(misses == 0L)
    // non-members: observed fp rate should be near 1% (generous bound)
    val nonMembers = (1 to 20000).map(i => s"absent-$i").toDF("k")
    val fps = nonMembers.filter(Contamination.mightContain(bloom, col("k"))).count()
    assert(fps < 20000 * 0.05, s"fp=$fps of 20000")
  }

  test("prefilter actually prunes: suspects are a small fraction of the corpus") {
    val bloom = Contamination.buildBloom(eval, "ek", fpp = 0.01)
    val suspects = corpus.filter(Contamination.mightContain(bloom, col("k"))).count()
    // 77 true members + ~1% fp of the other 923
    assert(suspects >= 77 && suspects < 200, s"suspects=$suspects")
  }
}
