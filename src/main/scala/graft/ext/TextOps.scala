package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, and document
  * fingerprinting. Everything is built from codegen'd built-in expressions
  * (no UDFs) operating per-row — embarrassingly parallel, no shuffles, no
  * driver-side work: the plan is a single WholeStageCodegen scan at any
  * data size.
  */
object TextOps {

  /** Whitespace-ish word tokens, lowercased. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9']+"), t => length(t) > 0)

  /** BPE-ish subword segmentation via the GPT-2 style regex family:
    * letter runs, digit runs, punctuation runs (approximation without a
    * learned vocab — deterministic and cheap).
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))

  /** k-token shingles ("w1 w2 w3") for near-dup hashing. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(k)),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Quality features: length, token stats, char-class ratios — the usual
    * pre-training heuristic filters.
    */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast(DoubleType)
    val toks = tokens(t)
    val nTok = size(toks).cast(DoubleType)
    val alnum = length(regexp_replace(t, "[^A-Za-z0-9]", "")).cast(DoubleType)
    val punct = length(regexp_replace(t, "[^.,;:!?]", "")).cast(DoubleType)
    val spaces = length(regexp_replace(t, "[^ ]", "")).cast(DoubleType)
    df.withColumn("q_len", len)
      .withColumn("q_n_tokens", nTok)
      .withColumn("q_avg_token_len", when(nTok > 0, (alnum / nTok)).otherwise(lit(0.0)))
      .withColumn("q_alnum_ratio", when(len > 0, alnum / len).otherwise(lit(0.0)))
      .withColumn("q_punct_ratio", when(len > 0, punct / len).otherwise(lit(0.0)))
      .withColumn("q_space_ratio", when(len > 0, spaces / len).otherwise(lit(0.0)))
      .withColumn("q_score",
        when(len > 0,
          lit(1.0)
            - abs(col("q_space_ratio") - lit(0.16)) * lit(2.0)
            - when(col("q_avg_token_len") < 2 || col("q_avg_token_len") > 12, lit(0.3)).otherwise(lit(0.0)))
          .otherwise(lit(0.0)))
  }

  /** Per-language high-frequency function-word markers, shared by
    * `languageId` and its DuckDB oracle (ExtQueries.q44) so the two stay in
    * lockstep.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " das ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " est "),
    "es" -> Seq(" el ", " la ", " y ", " los ", " es "),
    "it" -> Seq(" il ", " e ", " che ", " di ", " la "))

  /** Language-ID by stopword-hit scoring: counts occurrences of a few
    * high-frequency function words per language and takes the argmax.
    * An n-gram-profile heuristic, not a model — deterministic and
    * vectorizable. Returns 'und' when nothing matches.
    */
  def languageId(text: Column): Column = {
    val markers = langMarkers
    val padded = concat(lit(" "), lower(text), lit(" "))
    def count(m: String): Column =
      ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(m), ""))) / lit(m.length))
        .cast(LongType)
    val scores = markers.map { case (lang, ms) =>
      struct(ms.map(count).reduce(_ + _).as("hits"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD 2003 shape):
    * hash k-gram shingles, take the min hash in each sliding window of w,
    * dedupe — a compact sketch robust to local edits.
    */
  def fingerprint(text: Column, k: Int = 3, w: Int = 4): Column =
    graft.functions.TextNativeFunctions.fingerprint(text, k, w)

  /** PII scrub patterns, restricted to constructs whose semantics are
    * identical under Java regex (Spark) and RE2 (DuckDB/most engines):
    * char classes + greedy quantifiers + ASCII \b; no lookaround, no
    * backrefs. Shared with the q81 oracle so both engines mask in
    * lockstep.
    */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhoneRe = "\\+?\\d[\\d -]{7,}\\d"

  /** Redact emails, IPv4 addresses, and phone-like digit runs — the
    * pre-training PII scrub pass. Order matters and is fixed (email → ip →
    * phone) so an address inside an email is never double-masked.
    * Map-only: three codegen'd regexp_replace calls, no shuffle.
    */
  def maskPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmailRe, "[EMAIL]"),
        PiiIpv4Re, "[IP]"),
      PiiPhoneRe, "[PHONE]")

  /** Bigram-novelty quality signal — the integer-exact core of n-gram-LM
    * perplexity filtering (CCNet-style): a document whose token bigrams
    * are mostly UNSEEN elsewhere in the corpus is the document a
    * corpus-trained LM would assign high perplexity. Emits per doc the
    * bigram count, how many of its bigram occurrences are corpus-unique
    * (count == 1 ⇒ only this occurrence), and their exact ratio.
    *
    * Scale shape: one explode to (doc, bigram) — O(tokens) — one count
    * shuffle keyed by bigram, and one join of the same exploded stream
    * against the counts (AQE broadcasts when the vocab is small). All
    * arithmetic is integer until the final exact division, so results
    * hash-match any engine.
    */
  def bigramNovelty(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val toks = df.select(col(idCol),
      expr(s"regexp_extract_all(lower($textCol), '[a-z0-9\\']+', 0)").as("__t"))
    val bigrams = toks.filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("__t")) - 2),
        i => concat(element_at(col("__t"), i + 1), lit(" "),
          element_at(col("__t"), i + 2)))).as("__bg"))
    val counts = bigrams.groupBy("__bg").agg(count(lit(1)).as("__c"))
    bigrams.join(counts, "__bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).cast(LongType).as("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast(DoubleType) / col("n_bigrams").cast(DoubleType))
  }

  /** Encoding-artifact (mojibake) scoring — the signal behind ftfy-style
    * cleanup passes: crawled text decoded with the wrong charset leaves
    * fingerprints a curation pipeline filters or repairs on. Counted
    * classes, each a distinct artifact family:
    *   - U+FFFD replacement characters (decoder already gave up),
    *   - C1 control chars U+0080–U+009F (CP1252 bytes read as Latin-1),
    *   - 'Ã'/'Â' followed by a char in U+0080–U+00BF — the Latin-1
    *     rendering of a UTF-8 continuation byte (the "Ã©" family;
    *     restricting the follower keeps legitimate accented uppercase
    *     text like "SÃO"/"Âge" clean, at the cost of missing the rare
    *     CP1252-rendered follower and a lone trailing 'Ã') — and
    *     'â€' + one char (3-byte punctuation, the "â€™" family).
    * Emits the artifact occurrence count and its exact ratio to text
    * length; `clean` is the count==0 filter bit. Map-only, one regex
    * scan per row, no shuffle — the usual 100 TB posture for per-doc
    * signals. Regex is leftmost/non-overlapping alternation in both
    * Java and RE2, so the oracle replays the count exactly.
    */
  def encodingArtifacts(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // U+FFFD, the C1 block, U+00E2 U+20AC (the CP1252 moji-pair),
    // C3/C2 + a Latin-1-rendered continuation byte
    val pat = "\uFFFD|[\u0080-\u009F]|\u00E2\u20AC.|[\u00C3\u00C2][\u0080-\u00BF]"
    val n = size(regexp_extract_all(t, lit(pat), lit(0))).cast(LongType)
    df.select(col(idCol), n.as("n_artifacts"),
      when(length(t) > 0, n.cast(DoubleType) / length(t).cast(DoubleType))
        .otherwise(lit(0.0)).as("artifact_ratio"),
      (n === 0L).as("clean"))
  }

  /** Sliding-window document chunking — the retrieval/embedding prep
    * step: split each document into token windows of `chunkTokens` that
    * overlap by `overlapTokens` (stride = chunk − overlap), so a fact
    * straddling a boundary appears whole in at least one chunk. Chunk
    * text is the normalized token stream rejoined with single spaces
    * (the same normalization every downstream dedup/embedding step here
    * applies), and chunk count is
    *   1 + ceil(max(0, n − chunk) / stride)
    * — the last window is allowed to run short rather than re-reading
    * far backwards, the convention retrieval splitters use. Documents
    * with zero tokens emit nothing.
    *
    * Scale shape: pure per-row transform + explode — no shuffle, no
    * state; output size is input tokens × (1 + overlap/stride), known
    * in advance. Downstream writers repartition by size as usual.
    */
  def chunkDocuments(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkTokens: Int = 64,
      overlapTokens: Int = 16): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap < chunk, got chunk=$chunkTokens overlap=$overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) > 0)
    val n = size(col("__t"))
    // integer ceil((n - chunk)/stride) without touching negatives;
    // floor of an exact double quotient of ints < 2^31 is exact
    val nChunks = when(n <= chunkTokens, lit(1L))
      .otherwise(lit(1L) + floor((n - lit(chunkTokens) + lit(stride - 1)) / lit(stride)))
    toks
      .select(col(idCol), col("__t"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("__t"), i * stride + 1, lit(chunkTokens))))
          .as(Seq("chunk_idx", "__chunk")))
      .select(col(idCol), col("chunk_idx").cast(LongType).as("chunk_idx"),
        size(col("__chunk")).cast(LongType).as("n_chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Bigram-language-model fluency scoring — the CCNet/KenLM-shaped
    * quality signal: train transition statistics on a reference slice of
    * the corpus, score EVERY document by how predictable its token
    * transitions are under that model. Documents whose transitions the
    * reference model has never seen (spam, keyword stuffing, mojibake,
    * wrong-language text) score low; fluent in-distribution prose scores
    * high. Reference slice here = `doc_id % trainMod == 0` so the oracle
    * can replay it; a production pipeline passes its curated reference
    * corpus as the training side instead.
    *
    * Model: add-one-smoothed bigram MLE. For each transition (w1, w2),
    *   p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)
    * with c over the training slice's transitions and V the training
    * vocabulary size. The per-document score is the ARITHMETIC mean of
    * p over its transitions — deliberately not the log-domain geometric
    * mean: `ln` is the one operation whose low bits differ across
    * engines (see bm25TopK), while +,-,*,/ are IEEE-exact everywhere, so
    * the arithmetic mean hash-matches DuckDB bit-for-bit and ranks
    * documents the same direction (higher = more fluent). n_unseen (the
    * count of transitions absent from the model) is the complementary
    * integer signal — the "OOV rate" CCNet reports next to perplexity.
    *
    * Scale shape: one O(tokens) explode to transitions; bigram/prefix
    * counts are partial-agg-friendly shuffles over the TRAINING slice
    * only; scoring is two equi-joins of the full transition stream
    * against those counts (AQE broadcasts them when small — the model,
    * not the corpus, bounds their size) plus a 1-row vocabulary
    * broadcast; then one per-doc aggregate. No collect, no windows —
    * the same plan at 100 TB, with model size the only driver-free
    * knob (cap the training slice to cap the model).
    */
  def bigramLmScore(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", trainMod: Long = 5L): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    // one fused tokenize→pair Generator eval per row: the HOF
    // formulation's pushed-down `size(tokens)>=2` Filter re-ran the regex
    // tokenizer per row on EVERY branch that consumed the stream (plan
    // showed the regexp twice per scanned row, 4 branches deep)
    val trans = df.select(col(idCol),
      graft.functions.TextNativeFunctions.bigrams(col(textCol))
        .as(Seq("__w1", "__w2")))
    val trainTrans = trans.filter(col(idCol) % trainMod === 0)
    val bigramCounts = trainTrans.groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__cb"))
    // c(w1,·) = Σ_w2 c(w1,w2): derived from the bigram counts instead of
    // re-tokenizing + re-shuffling the whole training slice a second time
    // (identical values by definition; removes one corpus scan and one
    // corpus-sized exchange from the plan)
    val prefixCounts = bigramCounts.groupBy(col("__w1"))
      .agg(sum(col("__cb")).as("__cp"))
    // V = |training vocabulary| (all tokens, not just transition
    // prefixes) as a 1-row broadcast — stays in-plan, no collect
    val vocabV = df.filter(col(idCol) % trainMod === 0)
      .select(graft.functions.TextNativeFunctions.tokensGen(col(textCol))
        .as(Seq("__tok")))
      .agg(count_distinct(col("__tok")).as("__v"))
    val p = (coalesce(col("__cb"), lit(0L)) + lit(1L)).cast(DoubleType) /
      (coalesce(col("__cp"), lit(0L)) + col("__v")).cast(DoubleType)
    trans
      .join(bigramCounts, Seq("__w1", "__w2"), "left")
      .join(prefixCounts, Seq("__w1"), "left")
      .crossJoin(broadcast(vocabV))
      .select(col(idCol), p.as("__p"),
        when(col("__cb").isNull, 1L).otherwise(0L).as("__unseen"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_transitions"),
        sum(col("__unseen")).cast(LongType).as("n_unseen"),
        (graft.queries.Det.dsum(col("__p")) / count(lit(1))).as("avg_p"))
  }

  /** BM25 ranked keyword retrieval (Robertson/Sparck-Jones, the lexical
    * baseline next to the embedding-ANN route): score every document
    * against a bag of query terms and keep the global top `k`.
    *
    * Exactness: `ln` is the one libm call in BM25, and Java's Math.log
    * disagrees with C's log by 1 ulp on ~0.1% of idf arguments (measured)
    * — so the idf is quantized as floor(ln(·)·2^24) immediately, and every
    * later step is exact-rounded double arithmetic in a pinned evaluation
    * order, ending in an integer per-term score summed exactly. A 1-ulp
    * idf wobble flips the floor with probability ~2^-28 per distinct
    * (N, df) pair — and the verified datasets are checked bit-for-bit.
    * Constants: k1=1.2, b=0.75 (1-b written 0.25: exact, no subtraction).
    *
    * Scale shape: one token explode filtered to the query terms (the
    * filter prunes BEFORE the shuffle, so cost tracks matching tokens,
    * not corpus tokens), a per-(doc,term) count, a term-count broadcast
    * (|terms| rows), a 1-row stats broadcast, and a bounded-heap global
    * top-k (TopKPerKey, no full sort, no single-partition window over the
    * corpus). The final rank window runs over k rows.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 10): DataFrame = {
    val D = DoubleType
    val base = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), col("__t"), size(col("__t")).cast(LongType).as("__dl"))
    val stats = base.agg(count(lit(1)).as("__n_docs"), sum(col("__dl")).as("__total_dl"))
    val tf = base.select(col("doc_id"), col("__dl"), explode(col("__t")).as("__tok"))
      .where(col("__tok").isin(terms.distinct: _*))
      .groupBy(col("doc_id"), col("__dl"), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val avgdl = col("__total_dl").cast(D) / col("__n_docs").cast(D)
    val idfQ = floor(log(
      (col("__n_docs").cast(D) - col("__df").cast(D) + lit(0.5)) /
        (col("__df").cast(D) + lit(0.5)) + lit(1.0)) * lit(16777216.0))
    val den = col("__tf").cast(D) +
      lit(1.2) * (lit(0.25) + lit(0.75) * col("__dl").cast(D) / avgdl)
    val termScoreQ = floor(idfQ * (col("__tf").cast(D) * lit(2.2)) / den)
    val perDoc = tf.join(broadcast(dfreq), "__tok").crossJoin(broadcast(stats))
      .select(col("doc_id"), termScoreQ.as("__sq"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__sq")).cast(LongType).as("score_q"))
    val top = graft.plans.TopK.topKPerKey(
      perDoc.withColumn("__all", lit(1)),
      keys = Seq("__all"), orderBy = Seq(("score_q", false), ("doc_id", true)), k = k)
    import org.apache.spark.sql.expressions.Window
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score_q").desc, col("doc_id"))).cast(LongType))
      .select(col("doc_id"), col("score_q"), col("rank"))
  }

  /** Cross-corpus boilerplate-line removal (the RefinedWeb/C4 curation
    * pass the within-doc span dedup does NOT cover): a line whose
    * space-trimmed form appears in at least `minDocs` DISTINCT documents
    * is navigation/footer/cookie-banner furniture, and every occurrence
    * is dropped; empty lines are document structure and always survive.
    * Emits (id, n_lines_before, n_lines_removed, clean_text) for every
    * document, clean_text rebuilt in original line order.
    *
    * Scale shape: one line explode + one count-distinct aggregation keyed
    * by the line text (high cardinality — boilerplate is the small tail
    * that crosses the threshold), an anti-join back (AQE broadcasts the
    * boilerplate set when it is small, which it is by definition), and a
    * per-document collect_list bounded by document size. No driver-side
    * row work.
    */
  def removeBoilerplateLines(df: DataFrame, minDocs: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("line_norm", trim(col("line")))
    val boiler = lines.filter(col("line_norm") =!= "")
      .groupBy(col("line_norm"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= lit(minDocs))
      .select(col("line_norm"))
    val kept = lines.join(boiler, Seq("line_norm"), "left_anti")
    val before = lines.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines_before"))
    val keptAgg = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("clean_text"))
    // left join from `before`: a document whose every line was
    // boilerplate still comes back (empty clean_text), it does not vanish
    before.join(keptAgg, Seq(idCol), "left")
      .select(col(idCol),
        col("n_lines_before"),
        (col("n_lines_before") - coalesce(col("n_lines_kept"), lit(0L))).as("n_lines_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
