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

  test("ngramContamination equals the brute-force shingle-overlap fractions") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox sat still"),           // shares a prefix
      (3L, "completely different words entirely here"),
      (4L, "benchmark question one about spark joins"),
      (5L, "i quote benchmark question one about spark joins verbatim")
    ).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 4L).select(col("text"))
    val got = Contamination.ngramContamination(docs, "doc_id", "text", bench, "text",
        shingleK = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    // brute force: per-doc distinct 3-shingles vs the bench shingle set
    def shingles(t: String): Set[String] = {
      val toks = "[a-z0-9']+".r.findAllIn(t.toLowerCase).toSeq
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val bs = shingles("benchmark question one about spark joins")
    val want = docs.collect().map(r => (r.getLong(0), r.getString(1))).flatMap { case (id, t) =>
      val s = shingles(t)
      val frac = s.count(bs.contains).toDouble / s.size
      if (frac >= 0.3) Some(id -> frac) else None
    }.toMap
    assert(got == want, s"got=$got want=$want")
    assert(got.contains(4L) && got.contains(5L) && !got.contains(1L))
  }

  test("prefilter actually prunes: suspects are a small fraction of the corpus") {
    val bloom = Contamination.buildBloom(eval, "ek", fpp = 0.01)
    val suspects = corpus.filter(Contamination.mightContain(bloom, col("k"))).count()
    // 77 true members + ~1% fp of the other 923
    assert(suspects >= 77 && suspects < 200, s"suspects=$suspects")
  }
}
