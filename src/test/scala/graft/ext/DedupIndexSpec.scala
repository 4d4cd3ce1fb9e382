package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.{TxTable}

/** Persisted incremental MinHash index: batches filter against the
  * corpus without re-signaturing it; refreshes are exactly-once; corpus
  * rewrites rebuild so deleted docs stop blocking future batches.
  */
class DedupIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // long repetitive-ish texts so MinHash bands behave like real docs
  private def doc(seed: String): String =
    (1 to 30).map(i => s"$seed token$i word${i % 7}").mkString(" ")

  private def corpusDf: DataFrame = Seq(
    (1L, doc("alpha")), (2L, doc("beta")), (3L, doc("gamma")))
    .toDF("doc_id", "text")

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("filterNew drops near-dups of the corpus, keeps fresh docs; refresh is incremental") {
    val corpusLoc = TestSpark.tmpDir("dedupidx-corpus") + "/c"
    val idxLoc = TestSpark.tmpDir("dedupidx-index") + "/i"
    val corpus = new TxTable(spark, corpusLoc)
    corpus.create(corpusDf)
    assert(DedupIndex.refresh(corpus, idxLoc) == "initial")
    assert(DedupIndex.refresh(corpus, idxLoc) == "noop")

    val batch = Seq(
      (101L, doc("alpha")),          // exact copy -> dropped
      (102L, doc("beta") + " tail"), // near copy -> dropped
      (103L, doc("zeta")))           // fresh -> kept
      .toDF("doc_id", "text")
    assert(ids(DedupIndex.filterNew(corpus, idxLoc, batch)) == Seq(103L))

    // corpus grows; ONE incremental refresh indexes just the new docs
    corpus.append(Seq((4L, doc("delta"))).toDF("doc_id", "text"))
    assert(DedupIndex.refresh(corpus, idxLoc) == "incremental")
    val batch2 = Seq((201L, doc("delta")), (202L, doc("epsilon")))
      .toDF("doc_id", "text")
    assert(ids(DedupIndex.filterNew(corpus, idxLoc, batch2)) == Seq(202L))
  }

  test("corpus delete rebuilds the index: removed docs stop blocking batches") {
    val corpusLoc = TestSpark.tmpDir("dedupidx-rb-corpus") + "/c"
    val idxLoc = TestSpark.tmpDir("dedupidx-rb-index") + "/i"
    val corpus = new TxTable(spark, corpusLoc)
    corpus.create(corpusDf)
    DedupIndex.refresh(corpus, idxLoc)

    corpus.delete("doc_id = 2")        // beta leaves the corpus
    assert(DedupIndex.refresh(corpus, idxLoc) == "rebuild")
    val batch = Seq((301L, doc("beta")), (302L, doc("alpha")))
      .toDF("doc_id", "text")
    // beta is no longer corpus content -> its copy is FRESH now
    assert(ids(DedupIndex.filterNew(corpus, idxLoc, batch)) == Seq(301L))
  }

  test("hot boilerplate buckets are capped, not joined") {
    val corpusLoc = TestSpark.tmpDir("dedupidx-hot-corpus") + "/c"
    val idxLoc = TestSpark.tmpDir("dedupidx-hot-index") + "/i"
    // 30 corpus docs sharing one boilerplate text -> every band bucket
    // holds 30 members
    val boiler = (1L to 30L).map(i => (i, doc("same"))).toDF("doc_id", "text")
    val corpus = new TxTable(spark, corpusLoc)
    corpus.create(boiler)
    DedupIndex.refresh(corpus, idxLoc)
    val batch = Seq((401L, doc("same"))).toDF("doc_id", "text")
    // cap below the bucket population: the batch copy meets no candidate
    // and passes through — the documented skew/recall trade
    assert(ids(DedupIndex.filterNew(corpus, idxLoc, batch, maxBucketSize = 10)) ==
      Seq(401L))
    // default cap keeps it
    assert(ids(DedupIndex.filterNew(corpus, idxLoc, batch)).isEmpty)
  }
}
