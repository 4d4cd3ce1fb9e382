package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate nearest neighbor over embedding columns via random-
  * hyperplane LSH (sign-random-projection, Charikar STOC'02 shape).
  *
  * Hyperplanes are derived deterministically from xxhash64 of (plane, dim)
  * — no RNG state to ship, identical across executors and runs.
  *
  * Scale path vs brute force: brute force compares every query against
  * every candidate (fine when the query set is small and broadcastable);
  * LSH buckets the corpus by a `numPlanes`-bit signature so lookups only
  * scan matching buckets (+ optional multi-probe over 1-bit flips).
  * The bucket join shuffles by signature — no pairwise blow-up.
  */
object AnnLsh {

  /** `numPlanes`-bit signature of an embedding (array<float>) for one hash
    * table — native HyperplaneSigExpr (deterministic hyperplanes derived
    * from XXH64(table, plane, dim); one loop per row).
    */
  def signature(emb: Column, numPlanes: Int, table: Int = 0): Column =
    graft.functions.SketchFunctions.hyperplaneSig(emb, numPlanes, table)

  /** Cosine similarity of two float-array columns (plain double math — for
    * ranking, not for cross-engine hashing; see EmbeddingQueries for the
    * exactness-safe variant).
    */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.SketchFunctions.floatDot
    floatDot(a, b) / (sqrt(floatDot(a, a)) * sqrt(floatDot(b, b)))
  }

  /** Top-k neighbors for each query row via multi-table LSH buckets (with
    * 1-bit multi-probe per table to recover recall near bucket
    * boundaries). Standard recall/cost trade: L independent tables of
    * `numPlanes` bits each — a true neighbor is missed only if it lands in
    * a different (unprobed) bucket in all L tables.
    *
    * @param corpus  (idCol, embCol) table — the large side
    * @param queries (idCol, embCol) table — the small side
    */
  def topKLsh(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      k: Int = 10,
      numPlanes: Int = 8,
      numTables: Int = 8,
      multiProbeBits: Int = 1): DataFrame = {
    // corpus side: one (table, bucket) row per hash table
    val cBuckets = array((0 until numTables).map(t =>
      struct(lit(t).as("tbl"), signature(col(embCol), numPlanes, t).as("bkt"))): _*)
    val c = corpus.select(col(idCol).as("cid"), col(embCol).as("cemb"),
      explode(cBuckets).as("__tb"))
      .select(col("cid"), col("cemb"), col("__tb.tbl").as("__tbl"), col("__tb.bkt").as("__bucket"))
    // query side: own bucket plus 1-bit flips, per table
    val qProbes = flatten(array((0 until numTables).map { t =>
      val sig = signature(col(embCol), numPlanes, t)
      val probes = if (multiProbeBits >= 1) {
        array_union(array(sig), transform(sequence(lit(0), lit(numPlanes - 1)),
          p => sig.bitwiseXOR(call_function("shiftleft", lit(1L), p.cast(IntegerType)))))
      } else array(sig)
      transform(probes, b => struct(lit(t).as("tbl"), b.as("bkt")))
    }: _*))
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("qemb"),
      explode(qProbes).as("__tb"))
      .select(col("qid"), col("qemb"), col("__tb.tbl").as("__tbl"), col("__tb.bkt").as("__bucket"))
    val candidates = c.join(q, Seq("__tbl", "__bucket"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("qemb"), col("cid"), col("cemb"))
      .distinct()
    val scored = candidates.withColumn("cosine", cosine(col("qemb"), col("cemb")))
      .select(col("qid"), col("cid"), col("cosine"))
    rankTopK(scored, k)
  }

  /** Brute-force exact top-k (the baseline; broadcast the query side). */
  def topKBruteForce(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), col(embCol).as("cemb"))
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("qemb"))
    val scored = c.join(broadcast(q), col("cid") =!= col("qid"))
      .withColumn("cosine", cosine(col("qemb"), col("cemb")))
      .select(col("qid"), col("cid"), col("cosine"))
    rankTopK(scored, k)
  }

  /** Per-query top-k + rank column. The heavy selection runs through the
    * bounded-heap TopKPerKey operator (map-side partial top-k, O(n log k),
    * shuffle bounded at k rows per query per input partition) — NOT a
    * Window.partitionBy(qid) sort, which would funnel every candidate row
    * of the whole corpus into #queries tasks at scale. The row_number
    * window afterwards ranks only the k×#queries survivors.
    */
  private[ext] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = graft.plans.TopK.topKPerKey(scored, Seq("qid"), Seq(("cosine", false), ("cid", true)), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    top.withColumn("rn", row_number().over(w).cast(LongType))
  }
}
