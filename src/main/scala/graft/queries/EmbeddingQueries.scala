package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity-search operators over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Exactness: double→decimal casts are a cross-engine minefield (Spark
  * rounds the shortest string repr HALF_UP, DuckDB rounds the exact binary
  * value half-even, and JDK 17's Double.toString is not always the true
  * shortest repr). The only conversions that agree bit-for-bit in both
  * engines are: (a) floor() of any double, (b) integer↔decimal for
  * |v| < 2^52, and (c) exact-digit-string → double (correctly rounded).
  * So every per-element term t is quantized as floor(t · 2^48) — an exact
  * int64 — summed exactly in DECIMAL(38,0), converted via digit string to
  * double, and unscaled by 2^48 (a pure exponent shift). The resulting
  * operator is a deterministic fixed-point (2^-48-quantized) computation
  * that both engines reproduce exactly.
  *
  * Scale posture: brute-force kNN broadcasts the (small) query set against
  * the full corpus — a map-side-only plan with a final per-query top-k; the
  * LSH-bucketed variant (see ext/) bounds candidate pairs at 100 TB.
  */
object EmbeddingQueries {

  private val Dec0 = DecimalType(38, 0)
  // 2^48 — exactly representable; multiplying/dividing by it only shifts
  // the exponent. floor(t * 2^48) stays below 2^52 for |t| < 16.
  private val P48: Double = java.lang.Double.parseDouble("281474976710656")
  private val SqlP48 = "CAST('281474976710656' AS DOUBLE)"

  /** Deterministic 2^-48-quantized dot product of two float arrays (class
    * doc explains why this is the exactness-safe formulation) — evaluated
    * by the native DotExact48Expr: the zip_with/aggregate/DECIMAL(38,0)
    * formulation it is value-identical to (long accumulation is exact for
    * the documented |term| < 2^52 / 64-dim bound; long→double conversion
    * rounds to nearest even, same as the decimal digit-string route) was
    * interpreted per element (HOFs are CodegenFallback) and allocated a
    * Decimal per term — it dominated the brute-force kNN map stage.
    */
  private def dotExact(a: Column, b: Column): Column =
    graft.functions.SketchFunctions.dotExact48(a, b)

  private def norm2Exact(a: Column): Column = dotExact(a, a)

  /** DuckDB side of the same computation over an exploded (id, i, x) view. */
  private def sqlDot(xa: String, xb: String): String =
    s"(CAST(CAST(SUM(CAST(FLOOR($xa * $xb * $SqlP48) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / $SqlP48)"

  val defs: Seq[QueryDef] = Seq(

    // ---- per-vector squared L2 norm ----
    QueryDef(
      "q50_emb_norms",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        e.select(col("vec_id"), norm2Exact(col("embedding")).as("norm2"))
      },
      Some(s"""SELECT vec_id, ${sqlDot("x", "x")} AS norm2
        FROM (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x FROM embeddings)
        GROUP BY vec_id""")),

    // ---- brute-force cosine top-3 neighbors for a query set ----
    QueryDef(
      "q51_knn_bruteforce",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        // norms computed ONCE PER SIDE before the pair join (identical
        // doubles — same per-element math); the old per-pair placement
        // evaluated 3 exact dots per (query, candidate) row instead of 1
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            norm2Exact(col("embedding")).as("qn2"))
        val c = e.select(col("vec_id").as("cid"), col("embedding").as("cemb"),
          norm2Exact(col("embedding")).as("cn2"))
        val pairs = c.join(broadcast(q), col("cid") =!= col("qid"))
          .select(col("qid"), col("cid"),
            dotExact(col("qemb"), col("cemb")).as("dot"),
            col("qn2"), col("cn2"))
        // bounded-heap top-k operator, not a Window.partitionBy(qid) sort:
        // at scale the window funnels all corpus×#queries candidate rows
        // into #queries tasks; TopKPerKey keeps the selection map-side.
        val scored = pairs
          .select(col("qid"), col("cid"), (col("dot") / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cosine"))
        val top = graft.plans.TopK.topKPerKey(scored, Seq("qid"), Seq(("cosine", false), ("cid", true)), 3)
        val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
        top.withColumn("rn", row_number().over(w).cast(LongType))
      },
      Some(s"""WITH ex AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
            CAST(UNNEST(embedding) AS DOUBLE) AS x
          FROM embeddings
        ),
        dots AS (
          SELECT q.vec_id AS qid, c.vec_id AS cid, ${sqlDot("q.x", "c.x")} AS dot
          FROM ex q JOIN ex c ON q.i = c.i
          WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
          GROUP BY 1, 2
        ),
        norms AS (
          SELECT vec_id, ${sqlDot("x", "x")} AS n2
          FROM ex GROUP BY vec_id
        )
        SELECT qid, cid, cosine, rn FROM (
          SELECT qid, cid, dot / (sqrt(qn.n2) * sqrt(cn.n2)) AS cosine,
            CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY dot / (sqrt(qn.n2) * sqrt(cn.n2)) DESC, cid) AS BIGINT) AS rn
          FROM dots JOIN norms qn ON dots.qid = qn.vec_id
            JOIN norms cn ON dots.cid = cn.vec_id)
        WHERE rn <= 3"""),
      headline = true),

    // ---- per-label centroids (vector aggregation) ----
    QueryDef(
      "q52_label_centroids",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        e.select(col("label").cast(LongType).as("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("label"), col("pos").cast(LongType).as("dim"))
          .agg(
            ((sum(floor(col("x").cast(DoubleType) * lit(P48)).cast(Dec0)).cast(StringType).cast(DoubleType) / lit(P48))
              / count(lit(1))).as("centroid"),
            count(lit(1)).as("n_vecs"))
      },
      Some(s"""SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim,
          ((CAST(CAST(SUM(CAST(FLOOR(x * $SqlP48) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / $SqlP48)
            / COUNT(*)) AS centroid,
          COUNT(*) AS n_vecs
        FROM (SELECT label, generate_subscripts(embedding, 1) AS i,
                CAST(UNNEST(embedding) AS DOUBLE) AS x
              FROM embeddings)
        GROUP BY 1, 2""")),

    // ---- embedding-cosine near-dup pairs, exact baseline ----
    // all (a < b) with cosine >= 0.45 — the brute-force ground truth the
    // LSH-bucketed NearDup.cosineNearDups approximates at scale (its
    // recall is asserted in ExtOpsSpec); fixed-point dot/norms make the
    // threshold comparison engine-exact
    QueryDef(
      "q71_cosine_dup_pairs",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
        a.join(b, col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            (dotExact(col("ea"), col("eb")) /
              (sqrt(norm2Exact(col("ea"))) * sqrt(norm2Exact(col("eb"))))).as("cosine"))
          .filter(col("cosine") >= 0.45)
      },
      Some(s"""WITH ex AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
            CAST(UNNEST(embedding) AS DOUBLE) AS x
          FROM embeddings
        ),
        dots AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${sqlDot("a.x", "b.x")} AS dot
          FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
          GROUP BY 1, 2
        ),
        norms AS (
          SELECT vec_id, ${sqlDot("x", "x")} AS n2 FROM ex GROUP BY vec_id
        )
        SELECT id_a, id_b, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cosine
        FROM dots JOIN norms na ON dots.id_a = na.vec_id
          JOIN norms nb ON dots.id_b = nb.vec_id
        WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.45""")),

    // ---- SemDeDup semantic dedup: cluster-scoped near-dup removal ----
    // (Abbas et al. 2023: k-means cluster, pair only within clusters, keep
    // the lowest id per flagged pair.) FIXED literal centroids 2·e_j make
    // the whole operator hash-checkable: assignment to argmin ||x - 2e_j||²
    // is argmax over the first 4 components (plain SQL; separations in the
    // data are >= 1.8e-6, far above double rounding, so the comparison is
    // engine-exact), and the within-cluster pairing runs the fixed-point
    // cosine both engines reproduce bit-for-bit. Trained-centroid
    // semanticDedup stays covered by ExtOpsSpec.
    QueryDef(
      "q89_semantic_dedup",
      (s, dir) => {
        import s.implicits._
        val e = Tables.embeddings(s, dir)
        val dims = 64
        val centroids = (0 until 4).map(j =>
          (j, Array.tabulate(dims)(i => if (i == j) 2.0f else 0.0f).toSeq))
          .toDF("cell", "centroid")
        val cosExact = (a: Column, b: Column) =>
          dotExact(a, b) / (sqrt(norm2Exact(a)) * sqrt(norm2Exact(b)))
        graft.ext.NearDup.semanticDedupWith(e, centroids,
            threshold = 0.45, sim = cosExact)
          .groupBy(col("cluster_id").cast(LongType).as("cluster_id"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"))
          .orderBy(col("cluster_id"))
      },
      Some(s"""WITH cells AS (
          SELECT vec_id,
            CAST(CASE
              WHEN embedding[1] >= embedding[2] AND embedding[1] >= embedding[3]
                   AND embedding[1] >= embedding[4] THEN 0
              WHEN embedding[2] >= embedding[3] AND embedding[2] >= embedding[4] THEN 1
              WHEN embedding[3] >= embedding[4] THEN 2
              ELSE 3 END AS BIGINT) AS cluster_id
          FROM embeddings
        ),
        ex AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
            CAST(UNNEST(embedding) AS DOUBLE) AS x
          FROM embeddings
        ),
        dots AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${sqlDot("a.x", "b.x")} AS dot
          FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
          JOIN cells ca ON ca.vec_id = a.vec_id
          JOIN cells cb ON cb.vec_id = b.vec_id AND ca.cluster_id = cb.cluster_id
          GROUP BY 1, 2
        ),
        norms AS (
          SELECT vec_id, ${sqlDot("x", "x")} AS n2 FROM ex GROUP BY vec_id
        ),
        dropped AS (
          SELECT DISTINCT id_b AS vec_id
          FROM dots JOIN norms na ON dots.id_a = na.vec_id
            JOIN norms nb ON dots.id_b = nb.vec_id
          WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.45
        )
        SELECT c.cluster_id, COUNT(*) AS n_vecs,
          CAST(SUM(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id
        GROUP BY c.cluster_id ORDER BY c.cluster_id"""))
  )
}
