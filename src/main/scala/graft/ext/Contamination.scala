package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

/** Benchmark-contamination checks at corpus scale, exact results with a
  * Bloom-filter prefilter.
  *
  * The naive shape — `corpus JOIN eval ON key` (semi or anti) — shuffles
  * the ENTIRE corpus by key when the eval set is too large to broadcast as
  * a hash relation. A Bloom filter over the eval keys is ~10 bits/key at
  * 1% false positives (a 100M-key eval set is ~120 MB), so it broadcasts
  * where the exact set cannot; probing it is a map-only filter over the
  * corpus scan. Bloom filters have NO false negatives, which makes both
  * join flavors exact:
  *
  *   - semi  (find contaminated): might_contain=false rows are definitely
  *     clean; only the tiny might_contain=true remainder takes the exact
  *     join that removes false positives.
  *   - anti  (decontaminate): might_contain=false rows pass straight
  *     through map-side; the remainder takes the exact anti join.
  *
  * The expensive shuffle join therefore runs on O(|matches| + fpp·|corpus|)
  * rows instead of |corpus|. This is the same sketch-prefilter pattern
  * Spark's own InjectRuntimeFilter applies to selective joins; here it is
  * an explicit operator so pipelines can decontaminate against eval sets
  * far beyond the broadcast threshold. Build and probe reuse Spark's
  * codegen'd BloomFilterAggregate / BloomFilterMightContain expressions
  * over xxhash64(key).
  *
  * Reference scope: the reference engine exposes plain joins only; this is
  * part of the LLM-training-pipeline surface (contamination q54 is the
  * broadcastable-eval baseline; this is the scale path).
  */
object Contamination {

  /** Build the Bloom filter over `eval`'s key column: a distributed
    * partial aggregation (each task ORs its local sketch) reduced to one
    * binary value. The single collected value is the broadcast artifact —
    * the same thing Spark's runtime-filter subquery materializes — sized
    * by `expectedItems` and `fpp`, NOT by the corpus.
    */
  def buildBloom(eval: DataFrame, evalKey: String,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): Array[Byte] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = math.max(1L, expectedItems.getOrElse(eval.select(evalKey).count()))
    // optimal m = -n ln(p) / (ln 2)^2, capped so a mis-estimate cannot
    // allocate an absurd buffer (cap = 8 GiB of bits = 1 GiB filter)
    val bits = math.min((-n * math.log(fpp) / (math.log(2) * math.log(2))).ceil.toLong,
      8L * 1024 * 1024 * 1024)
    // BloomFilterAggregate silently clamps numBits to the session's
    // runtime-bloom-filter ceiling (default 67,108,864 bits ≈ 7M keys at
    // 1% fpp); beyond that the sketch would degrade toward fpp→1 and the
    // prefilter would stop pruning. Raise the ceiling to the computed size
    // for the build, restore after.
    val spark = eval.sparkSession
    val maxBitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prev = spark.conf.getOption(maxBitsKey)
    spark.conf.set(maxBitsKey, math.max(bits, 67108864L).toString)
    try {
      val agg = new BloomFilterAggregate(
        toExpr(xxhash64(col(evalKey))), Literal(n), Literal(bits)).toAggregateExpression()
      eval.select(toCol(agg).as("bf")).head.getAs[Array[Byte]](0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(maxBitsKey, v)
        case None => spark.conf.unset(maxBitsKey)
      }
    }
  }

  /** might_contain probe column against a prebuilt filter. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    toCol(BloomFilterMightContain(Literal(bloom), toExpr(xxhash64(key))))

  /** Exact left-semi join (rows of `corpus` whose key IS in `eval`),
    * Bloom-prefiltered: the shuffle join only sees rows the filter could
    * not rule out.
    */
  def bloomSemiJoin(corpus: DataFrame, corpusKey: String,
      eval: DataFrame, evalKey: String,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(eval, evalKey, expectedItems, fpp)
    corpus.filter(mightContain(bloom, col(corpusKey)))
      .join(eval.select(col(evalKey)).distinct(),
        col(corpusKey) === col(evalKey), "left_semi")
  }

  /** N-gram-level contamination: for every corpus document, the EXACT
    * fraction of its distinct `shingleK`-token shingles that appear in the
    * benchmark's shingle set; documents at or above `threshold` are
    * flagged. This is the partial-overlap decontamination real training
    * pipelines run (a doc quoting a benchmark question verbatim is
    * contaminated even when the whole texts differ).
    *
    * Scale shape: per-doc shingle totals come from `size(shingle_set)` —
    * map-only, no explode shuffle. The exploded (doc, shingle) stream is
    * probed against a broadcast Bloom filter of the benchmark shingles
    * map-side, so the exact semi-join + per-doc hit count shuffle only the
    * surviving suspects, O(|true hits| + fpp·|corpus shingles|). No false
    * negatives ⇒ the reported fractions are exact.
    */
  def ngramContamination(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String,
      shingleK: Int = 3, threshold: Double = 0.5, fpp: Double = 0.01): DataFrame = {
    val sets = corpus.select(col(idCol),
      graft.functions.TextNativeFunctions.shingleSet(col(textCol), shingleK).as("__set"))
    val totals = sets.select(col(idCol), size(col("__set")).cast("long").as("n_shingles"))
    val benchSh = bench.select(explode(
        graft.functions.TextNativeFunctions.shingleSet(col(benchTextCol), shingleK)).as("__bsh"))
      .distinct()
    val bloom = buildBloom(benchSh, "__bsh", fpp = fpp)
    val suspects = sets.select(col(idCol), explode(col("__set")).as("__sh"))
      .filter(mightContain(bloom, col("__sh")))
    val hits = suspects
      .join(benchSh, col("__sh") === col("__bsh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq(idCol)) // no hits -> fraction 0 -> never flagged
      .withColumn("contaminated_frac",
        col("n_hits").cast("double") / col("n_shingles").cast("double"))
      .filter(col("contaminated_frac") >= threshold)
      .select(col(idCol), col("n_shingles"), col("n_hits"), col("contaminated_frac"))
  }

  /** Exact left-anti join (rows of `corpus` whose key is NOT in `eval` —
    * decontamination), Bloom-prefiltered: definitely-clean rows pass
    * map-side without touching the join; only suspects are anti-joined.
    */
  def bloomAntiJoin(corpus: DataFrame, corpusKey: String,
      eval: DataFrame, evalKey: String,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(eval, evalKey, expectedItems, fpp)
    val probe = mightContain(bloom, col(corpusKey))
    // two map-only passes over the corpus scan beat one full-corpus
    // shuffle; no false negatives means !might_contain is definitely clean
    val clean = corpus.filter(!probe)
    val rescued = corpus.filter(probe)
      .join(eval.select(col(evalKey)).distinct(),
        col(corpusKey) === col(evalKey), "left_anti")
    clean.unionByName(rescued)
  }
}
