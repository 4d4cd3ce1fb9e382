package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection at corpus scale: MinHash+LSH, SimHash, and
  * exact n-gram Jaccard verification.
  *
  * Scale posture (the whole point of these ops):
  *   - Signatures are computed per-row by native Catalyst expressions
  *     (graft.functions.TextNative*) — one fused JVM loop per row; the
  *     higher-order-function formulation was interpreted and re-evaluated
  *     by optimizer rules (32× slower at sf0.1).
  *   - Candidate generation is a self-equi-join on (band index, band hash)
  *     — Spark shuffles both sides by that key, so candidate pairs are
  *     produced without any O(n²) comparison. Band width trades recall vs
  *     candidate count.
  *   - Only candidates are verified with exact Jaccard on shingle sets
  *     (array_intersect/union on the two rows joined back).
  *   - At 100 TB: the explode(bands) factor is `bands`×rows, shuffled once;
  *     hot buckets (boilerplate docs) are bounded by `maxBucketSize` to
  *     keep the join skew-safe — the same guard production dedup pipelines
  *     use before pair generation.
  */
object NearDup {

  /** MinHash signature over a shingle array — evaluated by the native
    * MinHashSigExpr Catalyst expression (one XXH64 double-hash pass per
    * element; the HOF formulation was interpreted and re-evaluated per
    * seed, dominating benchmark time at sf0.1).
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64): Column =
    graft.functions.SketchFunctions.minhashSig(shingleCol, numHashes)

  /** Candidate near-dup pairs via banded LSH over MinHash signatures.
    *
    * @param df          input
    * @param idCol       unique document id column name
    * @param textCol     text column name
    * @param shingleK    tokens per shingle
    * @param numHashes   signature length
    * @param bands       number of LSH bands (rows-per-band = numHashes/bands)
    * @param maxBucketSize skip pathological buckets larger than this
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    // the whole tokenize->shingle->minhash->band->explode pipeline is one
    // native Generator eval per row (see MinHashBandsGen's doc for the
    // Catalyst re-evaluation traps the fused form avoids)
    val withBands = df.select(col(idCol).as("__id"),
      graft.functions.TextNativeFunctions.minhashBandsGen(
        col(textCol), shingleK, numHashes, bands).as(Seq("__band", "__bucket")))
    val bucketed = withBands
      .groupBy("__band", "__bucket").agg(collect_list(col("__id")).as("__ids"))
      .filter(size(col("__ids")) > 1 && size(col("__ids")) <= maxBucketSize)
    bucketed
      .select(explode(sortedPairs(col("__ids"))).as("__pair"))
      .select(col("__pair.a").as("id_a"), col("__pair.b").as("id_b"))
      .distinct()
  }

  /** All ordered pairs (a < b) from a bucket's id list. */
  private def sortedPairs(ids: Column): Column = {
    val sorted = array_sort(ids)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)), y => struct(x.as("a"), y.as("b")))))
  }

  /** Verify candidate pairs with exact Jaccard over shingle sets; keeps
    * pairs with similarity >= threshold.
    *
    * Shape: ONE pass over the corpus. A two-sided join (candidates⋈sets on
    * id_a, then again on id_b) would tokenize+shingle every document twice
    * — there is no exchange to reuse when the small side broadcasts.
    * Instead each pair explodes into its two member ids, the (small)
    * member table broadcasts against a single shingle-set scan, and the
    * pair's two sets meet again in a tiny groupBy over matched rows only.
    *
    * The sets are DISTINCT SHINGLE HASHES, not shingle strings (guide
    * §2.3 — the matched rows' sets cross the verify groupBy's exchange,
    * so an 8-byte long per shingle moves ~k·avg-token-len fewer bytes
    * than the string, and array_intersect compares longs): Jaccard over
    * hashed sets equals Jaccard over string sets exactly unless two
    * distinct shingles of the pair collide on 64 bits — the documented
    * ~|S|²/2⁶⁵ bound on Kernels.shingleHashSet, zero at any realistic
    * document size. The exact ALL-PAIRS baseline (`ngramJaccardPairs`,
    * the oracle-checked ground truth) keeps string sets.
    */
  def verifyJaccard(
      candidates: DataFrame,
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sets = df.select(col(idCol).as("__vid"),
      graft.functions.TextNativeFunctions.shingleHashSet(col(textCol), shingleK).as("__set"))
    val members = candidates.select(
      explode(array(
        struct(col("id_a"), col("id_b"), col("id_a").as("__vid")),
        struct(col("id_a"), col("id_b"), col("id_b").as("__vid")))).as("m"))
      .select(col("m.id_a"), col("m.id_b"), col("m.__vid"))
    // no broadcast hint: members is candidate-count-sized (data-dependent);
    // AQE sees its materialized size and broadcasts when it is small
    members.join(sets, "__vid")
      .groupBy("id_a", "id_b")
      // each pair matches exactly its two member rows; which side is which
      // does not matter to Jaccard
      .agg(min_by(col("__set"), col("__vid")).as("__set_a"),
        max_by(col("__set"), col("__vid")).as("__set_b"))
      .withColumn("jaccard",
        size(array_intersect(col("__set_a"), col("__set_b"))).cast(DoubleType) /
          size(array_union(col("__set_a"), col("__set_b"))).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash LSH dedup: candidates → verify → pairs above threshold. */
  def minhashDupPairs(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame =
    verifyJaccard(
      minhashCandidates(df, idCol, textCol, shingleK, numHashes, bands),
      df, idCol, textCol, shingleK, threshold)

  /** 64-bit SimHash of the token multiset (native SimHash64Expr: one
    * hash + bit-vote loop per token).
    */
  def simhash64(tokensCol: Column): Column =
    graft.functions.SketchFunctions.simhash64(tokensCol)

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, found via
    * the pigeonhole block trick: split the 64-bit hash into `maxHamming+1`
    * blocks — any pair within distance k must agree exactly on >= 1 block,
    * so candidates come from equi-joins on (block index, block value); no
    * O(n²) scan.
    */
  def simhashDupPairs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val nBlocks = maxHamming + 1
    val blockBits = 64 / nBlocks
    val sims = df.select(col(idCol).as("__id"),
      graft.functions.TextNativeFunctions.simhashText(col(textCol)).as("__sim"))
    val blocks = sims.select(col("__id"), col("__sim"), posexplode(
      transform(sequence(lit(0), lit(nBlocks - 1)), b =>
        call_function("shiftright", col("__sim"), (b * blockBits).cast(IntegerType))
          .bitwiseAND(lit((1L << blockBits) - 1))))
      .as(Seq("__block", "__val")))
    val buckets = blocks.groupBy("__block", "__val")
      .agg(collect_list(struct(col("__id").as("a"), col("__sim").as("b"))).as("__members"))
      .filter(size(col("__members")) > 1 && size(col("__members")) <= maxBucketSize)
    val pairs = buckets.select(explode(memberPairs(col("__members"))).as("__p"))
      .select(col("__p.ida").as("id_a"), col("__p.idb").as("id_b"),
        col("__p.sima").as("__sima"), col("__p.simb").as("__simb"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("__sima").bitwiseXOR(col("__simb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast(LongType).as("hamming"))
  }

  private def memberPairs(members: Column): Column = {
    val sorted = array_sort(members)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)), y =>
        struct(x.getField("a").as("ida"), y.getField("a").as("idb"),
          x.getField("b").as("sima"), y.getField("b").as("simb")))))
  }

  /** Embedding-cosine near-dup pairs: all (id_a < id_b) with
    * cosine(emb_a, emb_b) >= threshold, found via multi-table hyperplane
    * LSH buckets (the scale path: candidates come from bucket collisions,
    * never an all-pairs join) and verified with the exact fixed-point
    * cosine. Multi-table + 1-bit multiprobe trades recall for cost the
    * same way topKLsh does; exact recall needs the brute-force pairing
    * (queries/EmbeddingQueries q71 uses that as the oracle-checked
    * baseline).
    */
  def cosineNearDups(
      df: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      threshold: Double = 0.8,
      numPlanes: Int = 12,
      numTables: Int = 6,
      maxBucketSize: Int = 1000): DataFrame = {
    val buckets = array((0 until numTables).map(t =>
      struct(lit(t).as("tbl"), AnnLsh.signature(col(embCol), numPlanes, t).as("bkt"))): _*)
    val exploded = df.select(col(idCol).as("__id"), col(embCol).as("__emb"),
        explode(buckets).as("__tb"))
      .select(col("__id"), col("__emb"), col("__tb.tbl").as("__tbl"), col("__tb.bkt").as("__bucket"))
    val a = exploded.select(col("__tbl"), col("__bucket"),
      col("__id").as("id_a"), col("__emb").as("__emba"))
    val b = exploded.select(col("__tbl"), col("__bucket"),
      col("__id").as("id_b"), col("__emb").as("__embb"))
    // bucket self-join on (table, bucket); skew guard mirrors minhash LSH:
    // pathological buckets are dropped rather than exploded quadratically
    val bucketSizes = exploded.groupBy("__tbl", "__bucket").count()
      .filter(col("count") <= maxBucketSize).drop("count")
    val pairs = a.join(bucketSizes, Seq("__tbl", "__bucket"))
      .join(b, Seq("__tbl", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("__emba"), col("id_b"), col("__embb"))
      .distinct()
    pairs
      .withColumn("cosine", AnnLsh.cosine(col("__emba"), col("__embb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embeddings with the IVF coarse quantizer, then find
    * near-duplicate pairs ONLY within each cluster and keep the lowest id
    * of every flagged pair. The approximation lives in the clustering —
    * within-cluster pairing is exact cosine — which is what bounds the
    * pair blow-up: pairs come from a `cluster_id` equi-join (shuffle by
    * cluster), never an all-pairs product, and `maxClusterSize` caps the
    * quadratic term per cluster exactly like `maxBucketSize` does for the
    * LSH routes.
    *
    * Clusters ABOVE `maxClusterSize` (the densest regions — exactly where
    * the duplicates are) are NOT silently kept whole: their pairing falls
    * back to hyperplane-LSH buckets WITHIN the cluster, so the quadratic
    * term stays bounded by bucket size while coverage degrades to
    * approximate instead of to zero. Each output row's `pairing` column
    * says which route covered its cluster ("exact" | "lsh"), so pipelines
    * can see — and re-run, tighten, or audit — the approximate region.
    *
    * Returns (id, cluster_id, kept, pairing): every corpus row tagged with
    * its cluster and whether it survives. Deterministic: centroids train
    * on a deterministic hash-sample with fixed seeds and iterations, and
    * the LSH planes are seeded by table index.
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      threshold: Double = 0.8,
      nlist: Int = 16,
      maxClusterSize: Int = 10000,
      numPlanes: Int = 12,
      numTables: Int = 6): DataFrame =
    semanticDedupWith(df, IvfAnn.trainCentroids(df, idCol, embCol, nlist = nlist),
      idCol, embCol, threshold, maxClusterSize, numPlanes, numTables)

  /** semanticDedup against a CALLER-SUPPLIED quantizer (cell, centroid) —
    * fixed literal centroids make the whole operator oracle-checkable
    * (assignment = argmin over constants is plain SQL), and `sim` lets
    * hash-exact pipelines swap the plain-double cosine for the fixed-point
    * one (EmbeddingQueries' convention).
    */
  def semanticDedupWith(
      df: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      threshold: Double = 0.8,
      maxClusterSize: Int = 10000,
      numPlanes: Int = 12,
      numTables: Int = 6,
      sim: (Column, Column) => Column = AnnLsh.cosine): DataFrame = {
    val assigned = IvfAnn.assign(df, centroids, idCol, embCol)
      .join(df.select(col(idCol), col(embCol)), idCol)
      .select(col(idCol), col("cell").as("cluster_id"), col(embCol).as("__emb"))
    val sizes = assigned.groupBy("cluster_id").count()
    val small = sizes.filter(col("count") <= maxClusterSize).drop("count")
    val big = sizes.filter(col("count") > maxClusterSize).drop("count")

    // exact pairwise inside bounded clusters
    val bounded = assigned.join(small, Seq("cluster_id"))
    val a = bounded.select(col("cluster_id"), col(idCol).as("id_a"), col("__emb").as("__ea"))
    val b = bounded.select(col("cluster_id"), col(idCol).as("id_b"), col("__emb").as("__eb"))
    val droppedExact = a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(sim(col("__ea"), col("__eb")) >= threshold)
      .select(col("id_b").as(idCol))

    // oversized clusters: LSH buckets WITHIN the cluster bound the
    // quadratic term; candidates verify with the same exact cosine
    val oversized = assigned.join(big, Seq("cluster_id"))
    val buckets = array((0 until numTables).map(t =>
      struct(lit(t).as("tbl"), AnnLsh.signature(col("__emb"), numPlanes, t).as("bkt"))): _*)
    val exploded = oversized.select(col("cluster_id"), col(idCol), col("__emb"),
        explode(buckets).as("__tb"))
      .select(col("cluster_id"), col(idCol), col("__emb"),
        col("__tb.tbl").as("__tbl"), col("__tb.bkt").as("__bucket"))
    val keys = Seq("cluster_id", "__tbl", "__bucket")
    val bucketOk = exploded.groupBy(keys.map(col): _*).count()
      .filter(col("count") <= maxClusterSize).drop("count")
    val la = exploded.select(col("cluster_id"), col("__tbl"), col("__bucket"),
      col(idCol).as("id_a"), col("__emb").as("__ea"))
    val lb = exploded.select(col("cluster_id"), col("__tbl"), col("__bucket"),
      col(idCol).as("id_b"), col("__emb").as("__eb"))
    val droppedLsh = la.join(bucketOk, keys)
      .join(lb, keys)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("__ea"), col("id_b"), col("__eb")).distinct()
      .filter(sim(col("__ea"), col("__eb")) >= threshold)
      .select(col("id_b").as(idCol))

    val dropped = droppedExact.unionByName(droppedLsh).distinct()
    assigned.join(dropped.withColumn("__drop", lit(true)), Seq(idCol), "left")
      .join(big.withColumn("__big", lit(true)), Seq("cluster_id"), "left")
      .select(col(idCol), col("cluster_id"), col("__drop").isNull.as("kept"),
        when(col("__big").isNotNull, lit("lsh")).otherwise(lit("exact")).as("pairing"))
  }

  /** Exact n-gram-Jaccard duplicate pairs: all (id_a < id_b) whose
    * k-token-shingle SETS overlap by at least `threshold` Jaccard. This is
    * the exact all-pairs baseline (ground truth for small corpora and for
    * the DuckDB oracle); at scale use the LSH route — minhashCandidates +
    * the same exact-Jaccard verify on candidates only.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      graft.functions.TextNativeFunctions.shingleSet(col(textCol), shingleK).as("__sh"))
    val a = sh.select(col("__id").as("id_a"), col("__sh").as("__sa"))
    val b = sh.select(col("__id").as("id_b"), col("__sh").as("__sb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("__sa"), col("__sb"))).cast(DoubleType) /
          size(array_union(col("__sa"), col("__sb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Duplicated-span detection (the distributed shape of Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better", which
    * removes VERBATIM substrings repeated across documents rather than
    * whole near-dup docs): a token position is "duplicated" when the
    * k-gram starting there also occurs in ANOTHER document; consecutive
    * duplicated positions merge into spans, and spans of at least
    * `minTokens` tokens are reported as (doc, start, end) in token
    * coordinates for a downstream cut-and-rejoin pass.
    *
    * Scale shape: one native Generator pass to (doc, pos, gram-hash) —
    * O(total tokens) rows, the same order as the corpus itself, one fused
    * tokenize+hash eval per row with the gram STRING never built (the
    * window only tests gram EQUALITY, so the 64-bit XXH64 carries the
    * same information at ~6× fewer shuffle bytes and long-vs-string sort
    * comparisons; collision bound documented on GramHashGen) — then ONE
    * shuffle on the gram hash (the suffix-array step of the paper,
    * re-expressed as a window: a gram is cross-doc iff min(doc) !=
    * max(doc) over its partition — computed in a single spill-capable
    * window pass, no groupBy+join-back and no second corpus scan), and a
    * per-doc window (doc_id partitioning, corpus-order parallelism) to
    * merge runs with the classic islands trick. No pairwise comparisons
    * anywhere.
    */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gramK: Int = 8,
      minTokens: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = df.select(col(idCol),
      graft.functions.TextNativeFunctions.gramHashes(col(textCol), gramK)
        .as(Seq("__pos", "__g")))
    // positions whose gram occurs in more than one document: ONE shuffle
    // by gram, min/max running aggregates (distinct-doc>1 ⟺ min≠max)
    val wg = Window.partitionBy(col("__g"))
    val dupPos = grams
      .withColumn("__mn", min(col(idCol)).over(wg))
      .withColumn("__mx", max(col(idCol)).over(wg))
      .filter(col("__mn") =!= col("__mx"))
      .select(col(idCol), col("__pos"))
    // islands: consecutive positions share (pos - rank)
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    dupPos
      .withColumn("__isl", col("__pos") - row_number().over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__pos")).cast(LongType).as("start_pos"),
        (max(col("__pos")) + lit(gramK) - 1).cast(LongType).as("end_pos"))
      .filter(col("end_pos") - col("start_pos") + 1 >= minTokens)
      .select(col(idCol), col("start_pos"), col("end_pos"),
        (col("end_pos") - col("start_pos") + 1).as("span_tokens"))
  }

  /** The cut pass over `duplicatedSpans`: rebuild each document's
    * (normalized) token stream with every duplicated span removed —
    * Lee et al.'s actual dedup step. Spans broadcast back onto the corpus
    * keyed by doc (they are span-count-sized, far smaller than the text);
    * the removal itself is a positional array filter inside the row — no
    * extra shuffle beyond the span computation. Output text is in
    * NORMALIZED token space (lowercased, `[a-z0-9']+` tokens joined by
    * single spaces), the same coordinates the spans are defined over.
    */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gramK: Int = 8,
      minTokens: Int = 15): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, gramK, minTokens)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("start_pos").as("s"), col("end_pos").as("e"))).as("__spans"))
    df.join(spans, Seq(idCol), "left")
      .withColumn("__t", expr(s"regexp_extract_all(lower($textCol), '[a-z0-9\\']+', 0)"))
      .withColumn("clean_text", array_join(
        filter(col("__t"), (tok, i) =>
          coalesce(!exists(col("__spans"),
            sp => i >= sp.getField("s") && i <= sp.getField("e")), lit(true))), " "))
      .withColumn("n_tokens_before", size(col("__t")).cast(LongType))
      // spans are disjoint merged islands within [0, n_before-1], so the
      // kept-token count is n_before − Σ span lengths — identical to (and
      // ~spans× cheaper than) re-running the positional membership filter
      // a second time per row
      .withColumn("n_tokens_after",
        (size(col("__t")).cast(LongType) - coalesce(
          aggregate(col("__spans"), lit(0L),
            (acc, sp) => acc + (sp.getField("e") - sp.getField("s") + lit(1L))),
          lit(0L))).cast(LongType))
      .drop("__t", "__spans")
  }

  /** Segment-level exact dedup with reassembly — the RefinedWeb/Falcon
    * "line dedup" recipe (Penedo et al. 2023 §4.3) adapted to fixed-size
    * token segments (this corpus has no line structure): split each
    * document into consecutive `segTokens`-token segments, keep each
    * DISTINCT segment only at its FIRST corpus occurrence (lowest
    * (doc, position)), drop every later copy, and rebuild the surviving
    * documents from their kept segments. Documents whose every segment
    * was seen earlier vanish entirely — exact-duplicate documents are a
    * special case, so this subsumes document-level exact dedup while also
    * cutting boilerplate repeated across documents.
    *
    * Unlike duplicatedSpans (which FINDS cross-doc repeats of any
    * alignment), this is the cheaper aligned-segment variant a production
    * pipeline runs first: O(tokens) rows, TWO shuffles total, nothing
    * pairwise.
    *
    * Scale shape: one projection to (doc, idx, segment) — same order as
    * the corpus — then ONE shuffle on the segment for keep-first as a
    * groupBy + min-of-struct. The groupBy matters: HashAggregate does
    * PARTIAL aggregation, so a boilerplate segment (license header, nav
    * bar) with millions of copies collapses to one candidate per map task
    * before it travels, where a window over the same key would buffer
    * every copy in a single reducer. Because (doc, idx) fully determines
    * the kept row — the segment text IS the group key — the aggregate
    * output needs no join back against the exploded segments. Then ONE
    * shuffle on the doc for reassembly. Output text is in the original
    * token coordinates (verbatim segments rejoined by single spaces).
    */
  def dedupSegments(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      segTokens: Int = 8): DataFrame = {
    val toks = df.select(col(idCol), split(col(textCol), " ").as("__t"))
    val segs = toks.select(col(idCol), posexplode(transform(
      sequence(lit(0),
        greatest(ceil(size(col("__t")) / lit(segTokens.toDouble)).cast("int"), lit(1)) - 1),
      i => array_join(slice(col("__t"), i * segTokens + 1, lit(segTokens)), " ")))
      .as(Seq("__idx", "__seg")))
    val kept = segs.groupBy(col("__seg"))
      .agg(min(struct(col(idCol), col("__idx"))).as("__w"))
      .select(col("__w").getField(idCol).as(idCol),
        col("__w").getField("__idx").as("__idx"), col("__seg"))
    kept.groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_kept_segments"),
        array_join(transform(
          array_sort(collect_list(struct(col("__idx"), col("__seg")))),
          s => s.getField("__seg")), " ").as("clean_text"))
  }

  /** Exact dedup: keep the first row (lowest orderCol) per exact key. */
  def exactDedup(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
