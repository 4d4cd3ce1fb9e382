package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.SketchFunctions.floatDot

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path alongside AnnLsh: partition the corpus into `nlist` cells
  * around centroids, then search only the `nprobe` cells nearest each
  * query (classic IVF-Flat, Jégou et al. shape).
  *
  * Determinism: centroids are seeded from the lowest-id vectors and
  * refined with Lloyd iterations whose mean-updates use order-independent
  * decimal accumulation — identical across runs and cluster layouts.
  *
  * Scale posture: assignment is a broadcast argmin against `nlist`
  * centroids (map-only); cell membership is a plain column, so the probe
  * phase is an equi-join on cell id — the corpus is scanned once at build,
  * and each query reads ~nprobe/nlist of the data.
  */
object IvfAnn {

  private val Dec0 = DecimalType(38, 0)
  private val P48: Double = java.lang.Double.parseDouble("281474976710656")

  /** Deterministic mean over float-array columns: per-dim floor-quantized
    * decimal sums (order-independent) divided by count.
    */
  private def exactMeanVector(df: DataFrame, embCol: String, dims: Int): DataFrame =
    df.select(col("cell"), posexplode(col(embCol)).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(((sum(floor(col("x").cast(DoubleType) * lit(P48)).cast(Dec0)).cast(DoubleType) / lit(P48))
        / count(lit(1))).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
      .select(col("cell"), transform(col("pairs"), p => p.getField("m").cast(FloatType)).as("centroid"))

  /** Build (or refine) centroids: seed with the `nlist` lowest-id vectors,
    * then `iterations` Lloyd steps. Returns (cell, centroid array<float>).
    */
  def trainCentroids(corpus: DataFrame, idCol: String = "vec_id", embCol: String = "embedding",
      nlist: Int = 16, iterations: Int = 2): DataFrame = {
    val dims = corpus.select(size(col(embCol))).first().getInt(0)
    var centroids = corpus.orderBy(col(idCol)).limit(nlist)
      .select((row_number().over(Window.orderBy(col(idCol))) - 1).as("cell"), col(embCol).as("centroid"))
    var i = 0
    while (i < iterations) {
      val assigned = assign(corpus, centroids, idCol, embCol)
        .join(corpus.select(col(idCol), col(embCol)), idCol)
      centroids = exactMeanVector(assigned, embCol, dims)
      i += 1
    }
    centroids
  }

  /** Assign each vector to its nearest centroid (broadcast argmin). */
  def assign(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val dist2 = floatDot(col(embCol), col(embCol)) +
      floatDot(col("centroid"), col("centroid")) -
      lit(2.0) * floatDot(col(embCol), col("centroid"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__d2"), col("cell"))
    vectors.select(col(idCol), col(embCol))
      .join(broadcast(centroids), lit(true))
      .withColumn("__d2", dist2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cell"))
  }

  /** Top-k cosine neighbors searching only the `nprobe` nearest cells per
    * query.
    */
  def topKIvf(corpus: DataFrame, queries: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding",
      k: Int = 10, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = trainCentroids(corpus, idCol, embCol, nlist)
    val indexed = corpus.select(col(idCol).as("cid"), col(embCol).as("cemb"))
      .join(assign(corpus, centroids, idCol, embCol).withColumnRenamed(idCol, "cid"), "cid")
    // probe cells: nprobe nearest centroids per query
    val qd2 = floatDot(col("qemb"), col("qemb")) +
      floatDot(col("centroid"), col("centroid")) -
      lit(2.0) * floatDot(col("qemb"), col("centroid"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("__d2"), col("cell"))
    val probes = queries.select(col(idCol).as("qid"), col(embCol).as("qemb"))
      .join(broadcast(centroids), lit(true))
      .withColumn("__d2", qd2)
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("qemb"), col("cell"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    indexed.join(probes, "cell")
      .filter(col("cid") =!= col("qid"))
      .withColumn("cosine", AnnLsh.cosine(col("qemb"), col("cemb")))
      .select(col("qid"), col("cid"), col("cosine"))
      .withColumn("rn", row_number().over(wTop).cast(LongType))
      .filter(col("rn") <= k)
  }
}
