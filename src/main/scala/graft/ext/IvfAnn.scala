package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.SketchFunctions
import graft.plans.TopK

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path alongside AnnLsh: partition the corpus into `nlist` cells
  * around centroids, then search only the `nprobe` cells nearest each
  * query (classic IVF-Flat, Jégou et al. shape).
  *
  * Determinism: centroids are seeded from the lowest-id vectors and
  * refined with Lloyd iterations whose mean-updates use order-independent
  * decimal accumulation — identical across runs and cluster layouts.
  *
  * Scale posture: the (tiny) centroid table is collected once and shipped
  * INSIDE a native expression (ArgminCellExpr — an implicit broadcast), so
  * cell assignment is a map-only projection: no corpus×nlist cartesian, no
  * row_number window, no Exchange between the scan and the cell column.
  * Probing is the same shape (TopCellsExpr + explode = nprobe rows per
  * query), and the final ranking is the bounded-heap TopKPerKey operator —
  * never a Window.partitionBy(qid) sort that would funnel every candidate
  * row into #queries tasks.
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

  /** Collect the centroid table to the driver as (row-major flat doubles,
    * cell ids, dims), ordered by cell id. nlist×dims is coarse-quantizer
    * sized (KBs) — this is the "broadcast" the assignment expression ships.
    */
  private def collectQuantizer(centroids: DataFrame): (Array[Double], Array[Int], Int) = {
    val rows = centroids.select(col("cell").cast(IntegerType), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1)
    require(rows.nonEmpty, "empty centroid table")
    val dims = rows.head._2.length
    val ids = rows.map(_._1)
    val flat = new Array[Double](rows.length * dims)
    var c = 0
    while (c < rows.length) {
      val v = rows(c)._2
      var i = 0
      while (i < dims) { flat(c * dims + i) = v(i).toDouble; i += 1 }
      c += 1
    }
    (flat, ids, dims)
  }

  /** Build (or refine) centroids: seed with the `nlist` lowest-id vectors,
    * then `iterations` Lloyd steps. Returns (cell, centroid array<float>).
    *
    * Scale: the Lloyd step posexplodes its input into (cell, dim, x) rows —
    * corpus×dims amplification through a shuffle per iteration. A coarse
    * quantizer does not need the full corpus (standard IVF practice, Jégou
    * et al. §V trains on a fraction), so training runs on a DETERMINISTIC
    * hash-sample capped at `maxTrainRows`: O(sample×dims) per iteration
    * regardless of corpus size, same centroids on any cluster layout.
    * Assignment/search still covers every vector.
    */
  def trainCentroids(corpus: DataFrame, idCol: String = "vec_id", embCol: String = "embedding",
      nlist: Int = 16, iterations: Int = 2, maxTrainRows: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = corpus.count()
    val train =
      if (total <= maxTrainRows) corpus
      else {
        // aim a little high, then floor at nlist×8 so every seed cell can
        // attract members even on adversarial id distributions
        val fraction = math.min(1.0, (maxTrainRows.toDouble / total) * 1.1)
        val sampled = Sampling.hashSample(corpus, idCol, fraction)
        if (sampled.limit(nlist * 8).count() >= nlist * 8L) sampled else corpus
      }
    val dims = train.select(size(col(embCol))).first().getInt(0)
    var centroids = train.orderBy(col(idCol)).limit(nlist)
      .select((row_number().over(Window.orderBy(col(idCol))) - 1).as("cell"), col(embCol).as("centroid"))
    var i = 0
    while (i < iterations) {
      val assigned = assign(train, centroids, idCol, embCol)
        .join(train.select(col(idCol), col(embCol)), idCol)
      centroids = exactMeanVector(assigned, embCol, dims)
      i += 1
    }
    centroids
  }

  /** Assign each vector to its nearest centroid — one map-only projection
    * (the centroid table rides inside the expression; see class doc).
    */
  def assign(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val (flat, ids, dims) = collectQuantizer(centroids)
    vectors.select(col(idCol),
      SketchFunctions.argminCell(col(embCol), flat, ids, dims).as("cell"))
  }

  /** Top-k cosine neighbors searching only the `nprobe` nearest cells per
    * query.
    */
  def topKIvf(corpus: DataFrame, queries: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding",
      k: Int = 10, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = trainCentroids(corpus, idCol, embCol, nlist)
    val (flat, ids, dims) = collectQuantizer(centroids)
    val indexed = corpus.select(col(idCol).as("cid"), col(embCol).as("cemb"),
      SketchFunctions.argminCell(col(embCol), flat, ids, dims).as("cell"))
    // probe cells: nprobe nearest centroids per query, map-only + explode
    val probes = queries.select(col(idCol).as("qid"), col(embCol).as("qemb"),
      explode(SketchFunctions.topCells(col(embCol), flat, ids, dims, nprobe)).as("cell"))
    // each corpus vector lives in exactly one cell and probe cells are
    // distinct per query, so the equi-join yields no duplicate candidates
    val scored = indexed.join(probes, "cell")
      .filter(col("cid") =!= col("qid"))
      .withColumn("cosine", AnnLsh.cosine(col("qemb"), col("cemb")))
      .select(col("qid"), col("cid"), col("cosine"))
    val top = TopK.topKPerKey(scored, Seq("qid"), Seq(("cosine", false), ("cid", true)), k)
    // rank the k×#queries survivors (tiny) for a stable output shape
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    top.withColumn("rn", row_number().over(w).cast(LongType))
  }
}
