package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.{TxLog, TxTable}

/** A PERSISTED MinHash band index over a document corpus, refreshed
  * incrementally — the production shape of continuous ingest dedup: new
  * crawl batches must be checked against the 100 TB corpus on every
  * arrival, and re-signaturing the corpus per batch (what
  * `NearDup.minhashDupPairs` over `corpus ∪ batch` would do) is the
  * difference between an O(batch) job and an O(corpus) one.
  *
  * The index is an ordinary transactional table of exploded band rows
  * `(doc_id, __band, __bucket)` — ~`bands` rows per document, tiny next
  * to the text it summarizes. Maintenance:
  *
  *   - `refresh` signs ONLY the corpus rows added since the last
  *     refresh (`changesSince`, proven exact by
  *     `CommitLog.appendOnlyBetween`) and lands them with
  *     `appendIdempotent` — the (appId, corpusVersion) SetTransaction
  *     watermark rides the same atomic commit, so a crash-replayed
  *     refresh re-checks the watermark and appends exactly once;
  *   - a non-append corpus commit (rewrite, delete) triggers a full
  *     index rebuild — stale signatures would hold deleted documents
  *     against future batches.
  *
  * `filterNew` then runs per batch: batch band rows equi-join the index
  * on (band, bucket) — never a pairwise scan — hot boilerplate buckets
  * are capped (`maxBucketSize`, the standard skew guard), and the
  * candidates are verified with EXACT n-gram Jaccard reading corpus
  * text only for the candidate ids (a semi-join the optimizer turns
  * into a broadcast when candidates are few). Batch and corpus id
  * spaces must be disjoint.
  */
object DedupIndex {

  private def appIdFor(corpusLocation: String): String =
    "graft-dedup-index-" + java.util.UUID.nameUUIDFromBytes(
      corpusLocation.getBytes("UTF-8")).toString

  private def bandRows(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, bands: Int): DataFrame =
    df.select(col(idCol),
      graft.functions.TextNativeFunctions.minhashBandsGen(
        col(textCol), shingleK, numHashes, bands).as(Seq("__band", "__bucket")))

  /** Bring the index at `indexLocation` up to date with `corpus`.
    * Returns "noop", "incremental", or "rebuild".
    */
  def refresh(corpus: TxTable, indexLocation: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16): String = {
    val spark = corpus.spark
    val appId = appIdFor(corpus.location)
    val to = corpus.version
    def sign(df: DataFrame) = bandRows(df, idCol, textCol, shingleK, numHashes, bands)
    val exists = TxLog.exists(spark, indexLocation)
    val idx = new TxTable(spark, indexLocation)
    if (!exists)
      // auto-compact by default: every incremental refresh appends a
      // small band file, and the per-batch filter join reads the WHOLE
      // index — debris would tax every arrival
      try idx.create(sign(corpus.toDF.limit(0)),
        properties = Map(TxTable.AutoCompactEnabledProp -> "true"))
      catch { case _: graft.catalog.AlreadyExistsError => () }
    val from = idx.latestTxnVersion(appId).getOrElse(-1L)
    if (to <= from) "noop"
    else if (from < 0) {
      // first build: sign the corpus SNAPSHOT, never its replayed
      // history — a log whose early commits were cleaned up after
      // checkpointing replays incompletely but snapshots exactly
      idx.appendIdempotent(sign(corpus.toDF(to)), appId, to)
      "initial"
    } else if (corpus.appendOnlySince(from, Some(to))) {
      idx.appendIdempotent(
        sign(corpus.changesSince(from, Some(to)).drop("_commit_version")), appId, to)
      "incremental"
    } else {
      // rewritten corpus: stale signatures would hold deleted documents
      // against future batches — rebuild, then stamp the watermark (a
      // crash between the two just rebuilds again; both are idempotent)
      idx.overwrite(sign(corpus.toDF(to)))
      idx.appendIdempotent(sign(corpus.toDF.limit(0)), appId, to)
      "rebuild"
    }
  }

  /** Verified near-dup matches of `batch` against the indexed corpus:
    * one row per (corpus id_a, batch id_b, exact jaccard >= threshold).
    */
  def matches(corpus: TxTable, indexLocation: String, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    val spark = corpus.spark
    val idx = TxTable.forLocation(spark, indexLocation).toDF
      .select(col(idCol).as("__corpus_id"), col("__band"), col("__bucket"))
    // skew guard: boilerplate buckets that hold more than maxBucketSize
    // corpus docs are dropped BEFORE the join (one metadata-sized agg
    // over the index, shuffled on the same key the join uses)
    val hot = idx.groupBy("__band", "__bucket")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize)
      .select("__band", "__bucket")
    val cands = bandRows(batch, idCol, textCol, shingleK, numHashes, bands)
      .withColumnRenamed(idCol, "__batch_id")
      .join(idx.join(hot, Seq("__band", "__bucket"), "left_anti"),
        Seq("__band", "__bucket"))
      .select(col("__corpus_id").as("id_a"), col("__batch_id").as("id_b"))
      .distinct()
    // corpus text only for candidate ids — O(candidates), not O(corpus)
    val candCorpusTexts = corpus.toDF.select(col(idCol), col(textCol))
      .join(cands.select(col("id_a").as(idCol)).distinct(), Seq(idCol), "left_semi")
    val universe = candCorpusTexts.unionByName(batch.select(col(idCol), col(textCol)))
    NearDup.verifyJaccard(cands, universe, idCol, textCol, shingleK, threshold)
  }

  /** `batch` minus every row whose text near-duplicates an indexed
    * corpus document — the per-arrival ingest filter.
    */
  def filterNew(corpus: TxTable, indexLocation: String, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    val dup = matches(corpus, indexLocation, batch, idCol, textCol,
      shingleK, numHashes, bands, threshold, maxBucketSize)
      .select(col("id_b").as(idCol)).distinct()
    batch.join(dup, Seq(idCol), "left_anti")
  }
}
