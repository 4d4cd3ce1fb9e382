package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Det._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (exact dedup, token/char stats, quality
  * scoring). Every expression is built from string primitives whose
  * semantics are identical in Spark and DuckDB (length/replace/trim),
  * so each query carries a full DuckDB oracle.
  *
  * Scale posture: all of these are embarrassingly parallel scans or
  * hash-aggregations keyed by high-cardinality columns — no driver-side
  * loops, no skew risk beyond what AQE handles.
  */
object TextQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- exact deduplication: group-by full text ----
    QueryDef(
      "q40_dedup_exact",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.groupBy(col("text"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"), col("text"))
      },
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, text
        FROM documents GROUP BY text"""),
      headline = true),

    // ---- token & char statistics (whitespace tokenizer) ----
    QueryDef(
      "q41_token_stats",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val t = trim(col("text"))
        val nTokens = when(length(t) === 0, lit(0L))
          .otherwise((length(t) - length(regexp_replace(t, lit(" "), lit(""))) + lit(1)).cast(LongType))
        d.select(col("doc_id"),
          length(col("text")).cast(LongType).as("n_chars_actual"),
          nTokens.as("n_tokens"))
      },
      Some("""SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
          CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
            ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END AS BIGINT) AS n_tokens
        FROM documents""")),

    // ---- corpus statistics by language/source ----
    QueryDef(
      "q42_corpus_stats",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
      },
      Some("""SELECT lang, source, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
          MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        FROM documents GROUP BY lang, source""")),

    // ---- quality scoring: char-class ratios in pure string arithmetic ----
    QueryDef(
      "q43_quality_score",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val len = length(col("text")).cast(DoubleType)
        val spaces = (length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit("")))).cast(DoubleType)
        val dots = (length(col("text")) - length(regexp_replace(col("text"), lit("\\."), lit("")))).cast(DoubleType)
        d.filter(length(col("text")) > 0)
          .select(col("doc_id"),
            (spaces / len).as("space_ratio"),
            (dots / len).as("dot_ratio"),
            ((len - spaces) / (spaces + lit(1.0))).as("avg_run_len"))
      },
      Some("""SELECT doc_id,
          CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) AS space_ratio,
          CAST(LENGTH(text) - LENGTH(REPLACE(text, '.', '')) AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) AS dot_ratio,
          (CAST(LENGTH(text) AS DOUBLE) - CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS DOUBLE))
            / (CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) + 1.0) AS avg_run_len
        FROM documents WHERE LENGTH(text) > 0""")),

    // ---- exact n-gram Jaccard duplicate pairs ----
    // the exact baseline behind the MinHash route (q47): both engines
    // tokenize [a-z0-9']+ runs of the lowercased text, build distinct
    // 3-token shingles, and compare set overlap — finding the planted
    // near-duplicates with their exact Jaccard scores
    QueryDef(
      "q72_ngram_jaccard_pairs",
      (s, dir) => graft.ext.NearDup.ngramJaccardPairs(
        Tables.documents(s, dir), shingleK = 3, threshold = 0.4),
      Some("""WITH sh AS (
          SELECT doc_id, list_distinct(
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            END) AS shingles
          FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS toks
                FROM documents)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.4""")),

    // ---- duplicated-span detection (exact substring dedup) ----
    // the Lee et al. 2022 op: token positions whose 8-gram recurs in
    // ANOTHER doc, merged into spans of >= 15 tokens. Both engines
    // tokenize identically (proven by q72); the oracle replays the same
    // gram/island algorithm in SQL, so the hash pins every span boundary
    QueryDef(
      "q91_duplicated_spans",
      (s, dir) => graft.ext.NearDup.duplicatedSpans(
        Tables.documents(s, dir), gramK = 8, minTokens = 15)
        .orderBy(col("doc_id"), col("start_pos")),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
          FROM documents
        ),
        gl AS (
          SELECT doc_id, list_transform(range(1, len(t) - 8 + 2),
            i -> array_to_string(t[i:i+7], ' ')) AS grams
          FROM toks WHERE len(t) >= 8
        ),
        grams AS (
          SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos, UNNEST(grams) AS g
          FROM gl
        ),
        crossdoc AS (
          SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1
        ),
        dpos AS (
          SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM crossdoc)
        ),
        islands AS (
          SELECT doc_id, pos,
            pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
          FROM dpos
        )
        SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_pos,
          CAST(MAX(pos) + 7 AS BIGINT) AS end_pos,
          CAST(MAX(pos) + 7 - MIN(pos) + 1 AS BIGINT) AS span_tokens
        FROM islands GROUP BY doc_id, isl
        HAVING MAX(pos) + 7 - MIN(pos) + 1 >= 15
        ORDER BY doc_id, start_pos"""),
      headline = true),

    // ---- the cut pass: duplicated spans removed from the text ----
    // rebuilds affected documents' normalized token streams without the
    // q91 spans; the oracle replays span detection AND the positional
    // filter in SQL, so the hash pins the rebuilt text byte-for-byte
    QueryDef(
      "q92_span_removal",
      (s, dir) => graft.ext.NearDup.removeDuplicatedSpans(
          Tables.documents(s, dir), gramK = 8, minTokens = 15)
        .filter(col("n_tokens_after") < col("n_tokens_before"))
        .select(col("doc_id"), col("n_tokens_before"), col("n_tokens_after"), col("clean_text"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
          FROM documents
        ),
        gl AS (
          SELECT doc_id, list_transform(range(1, len(t) - 8 + 2),
            i -> array_to_string(t[i:i+7], ' ')) AS grams
          FROM toks WHERE len(t) >= 8
        ),
        grams AS (
          SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos, UNNEST(grams) AS g
          FROM gl
        ),
        crossdoc AS (
          SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1
        ),
        dpos AS (
          SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM crossdoc)
        ),
        islands AS (
          SELECT doc_id, pos,
            pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
          FROM dpos
        ),
        spans AS (
          SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
          FROM islands GROUP BY doc_id, isl
          HAVING MAX(pos) + 7 - MIN(pos) + 1 >= 15
        ),
        sp AS (
          SELECT doc_id, list({'s': s, 'e': e}) AS spans FROM spans GROUP BY doc_id
        )
        SELECT t.doc_id,
          CAST(len(t.t) AS BIGINT) AS n_tokens_before,
          CAST(len(t.t) - len(list_filter(list_transform(range(1, len(t.t)+1),
            i -> CASE WHEN len(list_filter(sp.spans, x -> i-1 >= x.s AND i-1 <= x.e)) > 0
                 THEN 1 ELSE NULL END), v -> v IS NOT NULL)) AS BIGINT) AS n_tokens_after,
          COALESCE(array_to_string(list_filter(list_transform(range(1, len(t.t)+1),
            i -> CASE WHEN len(list_filter(sp.spans, x -> i-1 >= x.s AND i-1 <= x.e)) > 0
                 THEN NULL ELSE t.t[i] END), v -> v IS NOT NULL), ' '), '') AS clean_text
        FROM toks t JOIN sp ON t.doc_id = sp.doc_id
        ORDER BY t.doc_id""")),

    // ---- bigram novelty: the integer core of LM-perplexity filtering ----
    // a doc whose bigrams are mostly corpus-unique is the doc a
    // corpus-trained n-gram LM would call high-perplexity; all-integer
    // arithmetic until the final exact division, so the hash pins it
    QueryDef(
      "q93_bigram_novelty",
      (s, dir) => graft.ext.TextOps.bigramNovelty(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
          FROM documents
        ),
        bigrams AS (
          SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
          FROM toks, UNNEST(range(1, len(t))) AS u(i)
          WHERE len(t) >= 2
        ),
        counts AS (SELECT bg, COUNT(*) AS c FROM bigrams GROUP BY bg)
        SELECT doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty
        FROM bigrams JOIN counts USING (bg)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- sequence packing: concat-and-chunk into 512-token slots ----
    // the Spark side computes the global token prefix sum with the
    // two-phase distributed algorithm (ext/Packing.scala), NOT a
    // single-partition window; the oracle's sequential window cumsum
    // must agree chunk-for-chunk
    QueryDef(
      "q73_concat_chunk",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val t = trim(col("text"))
        val nTokens = when(length(t) === 0, lit(0L))
          .otherwise((length(t) - length(regexp_replace(t, lit(" "), lit(""))) + lit(1)).cast(LongType))
        val withTok = d.select(col("doc_id"), nTokens.as("tok"))
        graft.ext.Packing.concatChunk(withTok, "doc_id", "tok", chunkTokens = 512L)
          .groupBy(col("chunk_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok")).as("sum_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
      },
      Some("""WITH t AS (
          SELECT doc_id, CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
            ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END AS BIGINT) AS tok
          FROM documents
        ),
        c AS (
          SELECT doc_id, tok,
            SUM(tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS off
          FROM t
        )
        SELECT CAST(off // 512 AS BIGINT) AS chunk_id, COUNT(*) AS n_docs,
          CAST(SUM(tok) AS BIGINT) AS sum_tokens,
          MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM c GROUP BY 1""")),

    // ---- deterministic stratified sampling (dataset mixing) ----
    // membership from a multiplicative hash of doc_id — identical row
    // selection in any engine/partitioning, per-language mix fractions
    QueryDef(
      "q74_stratified_sample",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.ext.Sampling.stratifiedSample(d, "lang", "doc_id",
          Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.25), defaultFraction = 0.1)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 <
          CAST(FLOOR((CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5
                WHEN 'fr' THEN 0.25 ELSE 0.1 END) * 4294967296) AS BIGINT)
        GROUP BY lang ORDER BY lang""")),

    // ---- Gopher-style repetition filters (Rae et al. 2021 §A1.1) ----
    // duplicate-line fraction (by count and by characters) and the most
    // frequent word bigram per document, fused into one native generator
    // pass; the oracle rebuilds every metric from SQL list primitives.
    // Filters like dup_line_frac > 0.3 are how production pipelines drop
    // boilerplate/spam before training.
    QueryDef(
      "q80_repetition_stats",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.select(col("doc_id"),
            graft.functions.TextNativeFunctions.repetitionStats(col("text")).as(Seq(
              "n_lines", "dup_line_frac", "dup_line_char_frac", "top_bigram", "top_bigram_frac")))
      },
      Some("""WITH lines AS (
          SELECT doc_id,
            list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS ls
          FROM documents
        ),
        line_stats AS (
          SELECT doc_id,
            len(ls) AS n_lines,
            len(list_distinct(ls)) AS n_distinct,
            COALESCE(list_sum(list_transform(ls, x -> length(x))), 0) AS len_all,
            COALESCE(list_sum(list_transform(list_distinct(ls), x -> length(x))), 0) AS len_distinct
          FROM lines
        ),
        words AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \n]'), x -> x <> '') AS ws
          FROM documents
        ),
        bigrams AS (
          SELECT doc_id,
            unnest(list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i + 1])) AS bg
          FROM words WHERE len(ws) >= 2
        ),
        bgc AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bigrams GROUP BY doc_id, bg),
        top AS (
          SELECT doc_id, bg, cnt,
            ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg ASC) AS rn
          FROM bgc
        )
        SELECT d.doc_id,
          CAST(s.n_lines AS BIGINT) AS n_lines,
          CASE WHEN s.n_lines = 0 THEN 0.0
            ELSE CAST(s.n_lines - s.n_distinct AS DOUBLE) / CAST(s.n_lines AS DOUBLE) END AS dup_line_frac,
          CASE WHEN s.len_all = 0 THEN 0.0
            ELSE CAST(s.len_all - s.len_distinct AS DOUBLE) / CAST(s.len_all AS DOUBLE) END AS dup_line_char_frac,
          COALESCE(t.bg, '') AS top_bigram,
          CASE WHEN LENGTH(d.text) = 0 OR t.bg IS NULL THEN 0.0
            ELSE CAST(t.cnt * LENGTH(t.bg) AS DOUBLE) / CAST(LENGTH(d.text) AS DOUBLE) END AS top_bigram_frac
        FROM documents d
        JOIN line_stats s USING (doc_id)
        LEFT JOIN top t ON t.doc_id = d.doc_id AND t.rn = 1""")),

    // ---- PII scrubbing (pre-training redaction pass) ----
    // the corpus is synthetic, so a deterministic slice of documents gets
    // PII planted (email + phone + IPv4 derived from doc_id); the masked
    // text and per-kind mask counts must hash-match DuckDB running the
    // SAME regexes — proving the patterns behave identically under Java
    // regex and RE2, which is exactly the portability a scrub pass needs
    QueryDef(
      "q81_pii_scrub",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val planted = concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" Contact user"), col("doc_id").cast(StringType),
              lit("@mail.example or call +1 555 010 "), col("doc_id").cast(StringType),
              lit(" at 10.0."), (col("doc_id") % 256).cast(StringType), lit(".17 now")))
            .otherwise(lit("")))
        val m = graft.ext.TextOps.maskPii(planted)
        def nMasks(tag: String) =
          ((length(m) - length(regexp_replace(m, lit(java.util.regex.Pattern.quote(tag)), lit("")))) / tag.length)
            .cast(LongType)
        d.select(col("doc_id"), m.as("masked"),
          nMasks("[EMAIL]").as("n_emails"),
          nMasks("[IP]").as("n_ips"),
          nMasks("[PHONE]").as("n_phones"))
      },
      Some(s"""WITH planted AS (
          SELECT doc_id, text || CASE WHEN doc_id % 7 = 0
            THEN ' Contact user' || CAST(doc_id AS VARCHAR) ||
                 '@mail.example or call +1 555 010 ' || CAST(doc_id AS VARCHAR) ||
                 ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17 now'
            ELSE '' END AS text
          FROM documents
        ), masked AS (
          SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,
            '${graft.ext.TextOps.PiiEmailRe}', '[EMAIL]', 'g'),
            '${graft.ext.TextOps.PiiIpv4Re}', '[IP]', 'g'),
            '${graft.ext.TextOps.PiiPhoneRe}', '[PHONE]', 'g') AS m
          FROM planted
        )
        SELECT doc_id, m AS masked,
          CAST((LENGTH(m) - LENGTH(REPLACE(m, '[EMAIL]', ''))) / 7 AS BIGINT) AS n_emails,
          CAST((LENGTH(m) - LENGTH(REPLACE(m, '[IP]', ''))) / 4 AS BIGINT) AS n_ips,
          CAST((LENGTH(m) - LENGTH(REPLACE(m, '[PHONE]', ''))) / 7 AS BIGINT) AS n_phones
        FROM masked""")),

    // ---- duplicate GROUPS: connected components over dup pairs ----
    // pairs alone under-delete ({A~B, B~C} must keep ONE doc, not two);
    // this runs the distributed large-star/small-star algorithm (Kiveris
    // et al. 2014) over the deterministic q72 edge set and labels every
    // document with its component minimum. The oracle replays the same
    // pairs, then computes reachability with a recursive CTE — so the
    // hash pins the full transitive closure, not just the pair list.
    // (At 100 TB the edge input is minhashDupPairs — same operator, LSH
    // edges; q72 edges keep the oracle exact.)
    QueryDef(
      "q99_dup_components",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val pairs = graft.ext.NearDup.ngramJaccardPairs(d, shingleK = 3, threshold = 0.4)
        val comp = graft.ext.Components.connectedComponents(pairs, "id_a", "id_b")
        d.join(comp, d("doc_id") === comp("id"), "left")
          .select(d("doc_id"),
            coalesce(col("component"), d("doc_id")).cast(LongType).as("component"))
      },
      Some(s"""WITH RECURSIVE $pairsCte,
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(id, r) AS (
          SELECT DISTINCT u, u FROM edges
          UNION
          SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
        ),
        comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
        SELECT d.doc_id, CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""")),

    // ---- the composed near-dedup keep pass: one survivor per group ----
    QueryDef(
      "q100_dedup_survivors",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
        val pairs = graft.ext.NearDup.ngramJaccardPairs(
          Tables.documents(s, dir), shingleK = 3, threshold = 0.4)
        graft.ext.Components.dedupSurvivors(d, "doc_id", pairs, "id_a", "id_b")
      },
      Some(s"""WITH RECURSIVE $pairsCte,
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(id, r) AS (
          SELECT DISTINCT u, u FROM edges
          UNION
          SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
        ),
        comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
        SELECT d.doc_id, d.n_chars
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        WHERE c.component IS NULL OR c.component = d.doc_id""")),

    // ---- BM25 ranked keyword retrieval (lexical search baseline) ----
    // ln() is quantized at 2^24 immediately (Java vs C log differ by
    // 1 ulp on ~0.1% of idf arguments), every later step is exact-rounded
    // double math in a pinned order, and per-term scores are integers
    // summed exactly — so the top-10 ranking hash-matches DuckDB running
    // the same fixed-point formulation. Selection is the bounded-heap
    // TopKPerKey operator, not a corpus-wide sort.
    QueryDef(
      "q101_bm25_retrieval",
      (s, dir) => graft.ext.TextOps.bm25TopK(
        Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "vector", "merge", "customer"), k = 10),
      Some("""WITH docs AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t,
                 len(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS dl
          FROM documents
        ),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM docs),
        tf AS (
          SELECT doc_id, dl, tok, COUNT(*) AS tf
          FROM (SELECT doc_id, dl, UNNEST(t) AS tok FROM docs)
          WHERE tok IN ('spark', 'vector', 'merge', 'customer')
          GROUP BY doc_id, dl, tok
        ),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        scored AS (
          SELECT doc_id, FLOOR(
            FLOOR(LN((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 16777216.0)
            * (CAST(tf AS DOUBLE) * 2.2)
            / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS sq
          FROM tf JOIN dfreq USING (tok) CROSS JOIN stats
        ),
        ds AS (SELECT doc_id, CAST(SUM(sq) AS BIGINT) AS score_q
               FROM scored GROUP BY doc_id)
        SELECT doc_id, score_q, rank FROM (
          SELECT doc_id, score_q,
            CAST(ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT) AS rank
          FROM ds) WHERE rank <= 10""")),

    // ---- hashed linear quality classifier (fastText-shape filter) ----
    // Feature-hash each token into 2^20 buckets (31-polynomial rolling
    // hash), score with a deterministic integer pseudo-weight vector,
    // keep docs whose summed weight is positive — the model-driven
    // keep/drop step of production corpus curation, fused into one
    // native tokenizing pass per row (map-only; no explode, no shuffle
    // until the final aggregation a real pipeline wouldn't even run).
    // Integer weights make the score engine-exact: the oracle replays
    // hash, weights, sum and mean bit-for-bit in DuckDB.
    QueryDef(
      "q132_quality_classifier",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.select(col("doc_id"),
            graft.functions.TextNativeFunctions.classifierScore(col("text"))
              .as(Seq("n_tokens", "raw_score", "score", "keep")))
          .filter(col("n_tokens") > 0)
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS tok
          FROM documents
        ),
        hb AS (
          SELECT doc_id,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
              (acc, x) -> (acc * 31 + x) % 1048576) AS b
          FROM w
        ),
        sc AS (
          SELECT doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_tokens,
            CAST(SUM((b * 2654435761) % 4294967296 - 2147483648) AS BIGINT) AS raw_score
          FROM hb GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, raw_score,
          CAST(raw_score AS DOUBLE) / n_tokens AS score,
          raw_score > 0 AS keep
        FROM sc ORDER BY doc_id""")),

    // ---- classifier with a USER-SUPPLIED (trained) weight vector ----
    // The form a real deployment runs: a fastText-style training job
    // exports one float per feature-hash bucket, the vector is broadcast
    // once, and scoring gathers from it map-side. The fixture vector is a
    // deterministic LCG draw quantized to the 2^-10 grid — every weight is
    // exact in float AND double, so the dot product is a sum of 2^-10
    // multiples bounded far below 2^52: bit-exact in any summation order,
    // which is what lets DuckDB replay it for the hash check.
    QueryDef(
      "q138_classifier_trained_weights",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val w = Array.tabulate(graft.functions.ClassifierScoreGen.NumBuckets)(b =>
          (((b.toLong * 1664525L + 1013904223L) % 4096L) - 2048L).toFloat / 1024.0f)
        d.select(col("doc_id"),
            graft.functions.TextNativeFunctions.classifierScore(col("text"), w)
              .as(Seq("n_tokens", "raw_score", "score", "keep")))
          .filter(col("n_tokens") > 0)
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS tok
          FROM documents
        ),
        hb AS (
          SELECT doc_id,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
              (acc, x) -> (acc * 31 + x) % 1048576) AS b
          FROM w
        ),
        sc AS (
          SELECT doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_tokens,
            SUM(CAST((b * 1664525 + 1013904223) % 4096 - 2048 AS DOUBLE) / 1024.0) AS raw_score
          FROM hb GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, raw_score,
          raw_score / n_tokens AS score,
          raw_score > 0 AS keep
        FROM sc ORDER BY doc_id""")),

    // ---- leakage-safe train/val/test split ----
    // Rows are assigned to a split by the hash of their GROUP key (here
    // the source; in production the URL domain or the near-dup cluster
    // id), so documents sharing a key can never straddle train and eval
    // — the contamination leak a row-wise random split produces. The
    // result pins exactly that invariant (n_splits per source MUST be 1)
    // and the oracle replays the full assignment arithmetic — string
    // polynomial key, multiplicative hash, and the EXACT integer cut
    // points exported by splitCuts (re-deriving them through SQL's own
    // float accumulation would diverge by one ulp and flip a boundary
    // key).
    QueryDef(
      "q141_leakage_safe_split",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        graft.ext.Sampling.splitAssign(d, graft.ext.Sampling.stringKey(col("source")), splits)
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_in_split"))
          .groupBy(col("source"))
          .agg(max(col("split")).as("group_split"),
            count(lit(1)).as("n_splits"),
            sum(col("n_in_split")).as("n_docs"))
          .orderBy(col("source"))
      },
      Some {
        val cuts = graft.ext.Sampling.splitCuts(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        s"""WITH h AS (
          SELECT source,
            (list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(source, ''), c -> CAST(unicode(c) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 2147483648) * 2654435761) % 4294967296 AS h32
          FROM documents
        ),
        assigned AS (
          SELECT source,
            CASE WHEN h32 < ${cuts(0)} THEN 'train'
                 WHEN h32 < ${cuts(1)} THEN 'val'
                 ELSE 'test' END AS split
          FROM h
        ),
        bysrc AS (
          SELECT source, split, COUNT(*) AS n_in_split
          FROM assigned GROUP BY source, split
        )
        SELECT source, MAX(split) AS group_split,
          CAST(COUNT(*) AS BIGINT) AS n_splits,
          CAST(SUM(n_in_split) AS BIGINT) AS n_docs
        FROM bysrc GROUP BY source ORDER BY source"""
      }),

    // ---- cross-corpus boilerplate-line removal ----
    // The RefinedWeb/C4 curation pass the within-document span dedup
    // (q91/q92) does NOT cover: lines whose trimmed form recurs in >= 3
    // distinct documents (nav menus, cookie banners, newsletter footers)
    // are dropped from every document. The fixture PLANTS the furniture —
    // a shared header on doc_id % 5 == 0 and a shared footer on % 3 == 0
    // — so removal counts are deterministic and the oracle replays split,
    // trim-match, threshold, and the line-order text rebuild exactly.
    QueryDef(
      "q143_boilerplate_lines",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val planted = d.withColumn("text", concat(
          when(col("doc_id") % 5 === 0, lit("Cookie notice: we use cookies\n"))
            .otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 3 === 0, lit("\nSubscribe to our newsletter"))
            .otherwise(lit(""))))
        graft.ext.TextOps.removeBoilerplateLines(planted, minDocs = 3L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH planted AS (
          SELECT doc_id,
            (CASE WHEN doc_id % 5 = 0 THEN 'Cookie notice: we use cookies' || chr(10) ELSE '' END)
            || text ||
            (CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Subscribe to our newsletter' ELSE '' END) AS text
          FROM documents
        ),
        lines AS (
          SELECT doc_id, generate_subscripts(l, 1) AS pos, UNNEST(l) AS line
          FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM planted)
        ),
        n AS (SELECT doc_id, pos, line, trim(line, ' ') AS t FROM lines),
        boiler AS (
          SELECT t FROM n WHERE t <> ''
          GROUP BY t HAVING COUNT(DISTINCT doc_id) >= 3
        ),
        kept AS (
          SELECT doc_id, pos, line FROM n
          WHERE t = '' OR t NOT IN (SELECT t FROM boiler)
        ),
        bf AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines_before FROM lines GROUP BY doc_id),
        ka AS (SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(line, chr(10) ORDER BY pos) AS clean_text
               FROM kept GROUP BY doc_id)
        SELECT b.doc_id, b.n_lines_before,
          CAST(b.n_lines_before - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_lines_removed,
          COALESCE(ka.clean_text, '') AS clean_text
        FROM bf b LEFT JOIN ka ON b.doc_id = ka.doc_id
        ORDER BY b.doc_id"""))
  ) ++ Seq(

    // ---- end-to-end curation pipeline composition ----
    // The operators above chained the way a real corpus build runs them:
    // model-based quality filter (q132's engine-exact classifier) →
    // exact dedup keep-first (q40's shape) → leakage-safe split (q141's
    // assignment) → per-split document/token budget accounting. Each
    // stage is individually hash-proven; THIS entry pins that they
    // compose — the filter feeds the dedup feeds the split with no
    // column/semantics drift — because the oracle replays the whole
    // chain and any stage-boundary mismatch shifts a count.
    QueryDef(
      "q144_curation_pipeline",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val scored = d.select(col("doc_id"), col("source"), col("text"),
          graft.functions.TextNativeFunctions.classifierScore(col("text"))
            .as(Seq("n_tokens", "raw_score", "score", "keep")))
        val kept = scored.filter(col("keep"))
        val deduped = kept
          .groupBy(col("text"))
          .agg(min(struct(col("doc_id"), col("source"), col("n_tokens"))).as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
            col("r.n_tokens").as("n_tokens"))
        val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
        graft.ext.Sampling.splitAssign(deduped,
            graft.ext.Sampling.stringKey(col("source")), splits)
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("sum_tokens"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy(col("split"))
      },
      Some {
        val cuts = graft.ext.Sampling.splitCuts(
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        s"""WITH w AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS tok
          FROM documents
        ),
        hb AS (
          SELECT doc_id,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
              (acc, x) -> (acc * 31 + x) % 1048576) AS b
          FROM w
        ),
        sc AS (
          SELECT doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_tokens,
            CAST(SUM((b * 2654435761) % 4294967296 - 2147483648) AS BIGINT) AS raw_score
          FROM hb GROUP BY doc_id
        ),
        keepdocs AS (
          SELECT d.doc_id, d.source, d.text, sc.n_tokens
          FROM documents d JOIN sc ON d.doc_id = sc.doc_id
          WHERE sc.raw_score > 0
        ),
        survivors AS (
          SELECT k.doc_id, k.source, k.n_tokens
          FROM keepdocs k
          JOIN (SELECT text, MIN(doc_id) AS keep_id FROM keepdocs GROUP BY text) dd
            ON k.doc_id = dd.keep_id
        ),
        assigned AS (
          SELECT doc_id, source, n_tokens,
            CASE WHEN h32 < ${cuts(0)} THEN 'train'
                 WHEN h32 < ${cuts(1)} THEN 'val'
                 ELSE 'test' END AS split
          FROM (
            SELECT *,
              (list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(source, ''), c -> CAST(unicode(c) AS BIGINT))),
                 (acc, x) -> (acc * 31 + x) % 2147483648) * 2654435761) % 4294967296 AS h32
            FROM survivors)
        )
        SELECT split, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
          CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM assigned GROUP BY split ORDER BY split"""
      }),

    // ---- registrable-domain (eTLD+1) extraction + blocklist filter ----
    // The URL layer of crawl curation: attribute documents to their
    // REGISTRABLE domain under a public-suffix-style rule list (longest
    // suffix wins, registrable = suffix + one label, implicit `*` rule
    // for unknown TLDs — publicsuffix.org semantics), then drop blocked
    // publishers at that grain (blocking example.co.uk kills every
    // subdomain in one rule). The fixture synthesizes URLs whose hosts
    // exercise all four rule shapes — plain TLD, multi-label suffix
    // (co.uk), PRIVATE registry suffix (github.io — where naive
    // TLD-splitting misattributes every project site to github.io's
    // registrant), and an unknown TLD falling to the `*` rule. The
    // whole pass is map-only (broadcast suffix set, no join); the
    // oracle recomputes domains and group totals from the same
    // construction.
    QueryDef(
      "q148_url_domain_filter",
      (s, dir) => {
        val suffixes = Seq("com", "org", "uk", "co.uk", "io", "github.io")
        val blocked = Seq("src3.github.io", "src7.co.uk")
        // doc_id ≡ source-index (mod 20) in the fixture, so suffix
        // selection uses doc_id DIV 20 — every source cycles through
        // all four suffix shapes and the blocked domains really exist
        val urled = Tables.documents(s, dir).withColumn("url",
          concat(lit("https://"), col("lang"), lit("."), col("source"),
            element_at(
              array(lit(".com"), lit(".co.uk"), lit(".github.io"), lit(".xyz")),
              (pmod(expr("doc_id div 20"), lit(4)) + 1).cast("int")),
            lit("/p/"), col("doc_id")))
        val filtered = graft.ext.UrlOps.filterBlockedDomains(
          urled, "url", suffixes, blocked)
        graft.ext.UrlOps.withRegistrableDomain(filtered, "url", suffixes)
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("domain"))
      },
      Some("""WITH u AS (
          SELECT n_chars,
            source || CASE CAST((doc_id // 20) % 4 AS INTEGER)
              WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
              WHEN 2 THEN '.github.io' ELSE '.xyz' END AS domain
          FROM documents
        )
        SELECT domain, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM u WHERE domain NOT IN ('src3.github.io', 'src7.co.uk')
        GROUP BY domain ORDER BY domain""")),

    // ---- q164: canonical-URL dedup (C4's "dedup by URL" with CCNet-
    // style normalization first) ----
    // Five deterministically-planted MESSY variants of each page URL —
    // upper-cased scheme/host, `www.`, the default :443 port, trailing
    // slash, tracking params (`utm_*`), shuffled param order, fragments —
    // must collapse to ONE canonical key per (page, kept-params) group.
    // Spark canonicalizes by PARSING (CanonicalUrlExpr); the oracle
    // CONSTRUCTS the expected canonical strings directly from the same
    // components — an independent derivation, not a replay. Variants
    // 0-2 carry no surviving params, 3-4 keep a=1&b=2 in either order.
    QueryDef(
      "q164_canonical_url_dedup",
      (s, dir) => {
        val gid = expr("doc_id div 100")
        val variant = pmod(expr("doc_id div 20"), lit(5))
        val urled = Tables.documents(s, dir).withColumn("url",
          when(variant === 0,
            concat(lit("https://www."), col("source"), lit(".com/a/"), gid))
          .when(variant === 1,
            concat(lit("HTTPS://WWW."), upper(col("source")), lit(".COM:443/a/"),
              gid, lit("/")))
          .when(variant === 2,
            concat(lit("https://"), col("source"), lit(".com/a/"), gid,
              lit("?utm_source=x&utm_campaign=y")))
          .when(variant === 3,
            concat(lit("https://www."), col("source"), lit(".com/a/"), gid,
              lit("?b=2&a=1#frag")))
          .otherwise(
            concat(lit("https://"), col("source"), lit(".com:443/a/"), gid,
              lit("?a=1&b=2&utm_medium=z"))))
        graft.ext.UrlOps.withCanonicalUrl(urled, "url")
          .groupBy(col("canonical_url"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .orderBy(col("canonical_url"))
      },
      Some("""WITH u AS (
          SELECT doc_id,
            'https://' || source || '.com/a/' || CAST(doc_id // 100 AS VARCHAR)
              || CASE WHEN CAST((doc_id // 20) % 5 AS INTEGER) IN (3, 4)
                 THEN '?a=1&b=2' ELSE '' END AS cu
          FROM documents
        )
        SELECT cu AS canonical_url, COUNT(*) AS n_docs,
          CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM u GROUP BY cu ORDER BY cu""")),

    // ---- bigram-LM fluency scoring (CCNet-shaped perplexity signal) ----
    // Train add-one-smoothed bigram transition statistics on the
    // doc_id%5==0 reference slice, score every document by its mean
    // transition probability plus its unseen-transition count. The mean
    // is arithmetic (not log-geometric) so all arithmetic is IEEE-exact
    // +,-,*,/ — the oracle replays the counts, the single double
    // division per transition, and the exact decimal mean bit-for-bit
    // (see ext/TextOps.bigramLmScore for the determinism argument).
    QueryDef(
      "q150_bigram_lm_score",
      (s, dir) => graft.ext.TextOps.bigramLmScore(Tables.documents(s, dir))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
          FROM documents
        ),
        tr AS (
          SELECT doc_id, t[i] AS w1, t[i+1] AS w2
          FROM toks, UNNEST(range(1, len(t))) AS u(i)
          WHERE len(t) >= 2
        ),
        train_tr AS (SELECT w1, w2 FROM tr WHERE doc_id % 5 = 0),
        big AS (SELECT w1, w2, COUNT(*) AS cb FROM train_tr GROUP BY 1, 2),
        pre AS (SELECT w1, COUNT(*) AS cp FROM train_tr GROUP BY 1),
        v AS (
          SELECT COUNT(DISTINCT tok) AS vv
          FROM (SELECT UNNEST(t) AS tok FROM toks WHERE doc_id % 5 = 0)
        ),
        scored AS (
          SELECT tr.doc_id,
            CAST(COALESCE(big.cb, 0) + 1 AS DOUBLE) /
              CAST(COALESCE(pre.cp, 0) + v.vv AS DOUBLE) AS p,
            CASE WHEN big.cb IS NULL THEN 1 ELSE 0 END AS unseen
          FROM tr
          LEFT JOIN big ON tr.w1 = big.w1 AND tr.w2 = big.w2
          LEFT JOIN pre ON tr.w1 = pre.w1
          CROSS JOIN v
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
          CAST(SUM(unseen) AS BIGINT) AS n_unseen,
          """ + Det.sqlSum("p") + """ / COUNT(*) AS avg_p
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ---- sliding-window chunking (retrieval/embedding prep) ----
    // 64-token windows overlapping by 16 (stride 48), the last window
    // allowed to run short; map-only explode, no shuffle. The oracle
    // replays the window math with DuckDB's 1-based inclusive list
    // slices and integer division.
    QueryDef(
      "q152_doc_chunking",
      (s, dir) => graft.ext.TextOps.chunkDocuments(Tables.documents(s, dir),
          chunkTokens = 64, overlapTokens = 16)
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
          FROM documents
        ),
        nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        k AS (
          SELECT doc_id, t,
            CASE WHEN n <= 64 THEN 1 ELSE 1 + (n - 64 + 47) // 48 END AS nc
          FROM nz
        ),
        ch AS (
          SELECT doc_id, i AS chunk_idx, t[i * 48 + 1 : i * 48 + 64] AS c
          FROM k, UNNEST(range(0, nc)) AS u(i)
        )
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
          CAST(len(c) AS BIGINT) AS n_chunk_tokens,
          array_to_string(c, ' ') AS chunk_text
        FROM ch ORDER BY doc_id, chunk_idx""")),

    // ---- mojibake / encoding-artifact scoring (ftfy-shaped signal) ----
    // The fixture corpus is clean ASCII, so artifacts are PLANTED
    // deterministically (the "Ã©" 2-byte family on doc_id%7, the "â€™"
    // smart-quote family on %11, U+FFFD on %13) and both engines count
    // them with the same leftmost/non-overlapping alternation — Spark
    // via Java-regex unicode escapes, DuckDB via RE2 \x{...} classes.
    QueryDef(
      "q153_encoding_artifacts",
      (s, dir) => {
        val planted = Tables.documents(s, dir).withColumn("text", concat(
          col("text"),
          when(col("doc_id") % 7 === 0, lit("Ã©")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit("â€™")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit("�")).otherwise(lit(""))))
        graft.ext.TextOps.encodingArtifacts(planted).orderBy(col("doc_id"))
      },
      Some("""WITH planted AS (
          SELECT doc_id,
            text || CASE WHEN doc_id % 7 = 0 THEN 'Ã©' ELSE '' END
              || CASE WHEN doc_id % 11 = 0 THEN 'â€™' ELSE '' END
              || CASE WHEN doc_id % 13 = 0 THEN '�' ELSE '' END AS text
          FROM documents
        )
        SELECT doc_id,
          CAST(len(regexp_extract_all(text,
            '\x{FFFD}|[\x{0080}-\x{009F}]|\x{00E2}\x{20AC}.|[\x{00C3}\x{00C2}][\x{0080}-\x{00BF}]')) AS BIGINT)
            AS n_artifacts,
          CASE WHEN length(text) > 0 THEN
            CAST(len(regexp_extract_all(text,
              '\x{FFFD}|[\x{0080}-\x{009F}]|\x{00E2}\x{20AC}.|[\x{00C3}\x{00C2}][\x{0080}-\x{00BF}]')) AS DOUBLE)
              / length(text)
          ELSE 0.0 END AS artifact_ratio,
          len(regexp_extract_all(text,
            '\x{FFFD}|[\x{0080}-\x{009F}]|\x{00E2}\x{20AC}.|[\x{00C3}\x{00C2}][\x{0080}-\x{00BF}]')) = 0
            AS clean
        FROM planted ORDER BY doc_id""")),

    // ---- quality-bucketed token-budget corpus mixing ----
    // How pretraining mixes are actually built: score every document
    // with the (engine-exact, q132-oracled) hashed classifier, bucket
    // into quality tiers on INTEGER thresholds (raw_score vs per-token
    // cutoffs — no float compares anywhere near a boundary), then give
    // each tier its own token budget and cut deterministically with the
    // distributed-prefix-sum mix (q103's operator): high quality gets
    // the big budget, low quality a trickle. One scan + the prefix
    // sum's two bounded shuffles; the oracle replays scoring,
    // bucketing, and the per-tier running cut in DuckDB.
    QueryDef(
      "q157_quality_bucket_mix",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val scored = d.select(col("doc_id"),
          graft.functions.TextNativeFunctions.classifierScore(col("text"))
            .as(Seq("n_tokens", "raw_score", "score", "keep")))
          .filter(col("n_tokens") > 0)
        val bucketed = scored.withColumn("bucket",
          when(col("raw_score") > lit(360000000L) * col("n_tokens"), "high")
            .when(col("raw_score") > lit(207000000L) * col("n_tokens"), "mid")
            .otherwise("low"))
        val budgets = Map("high" -> 6000L, "mid" -> 3000L, "low" -> 1200L)
        graft.ext.Sampling.tokenBudgetMix(
            bucketed.select(col("doc_id"), col("bucket"), col("n_tokens")),
            "bucket", "doc_id", "n_tokens", budgets)
          .select(col("doc_id"), col("bucket"), col("n_tokens"), col("cum_tokens"))
      },
      Some("""WITH w AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS tok
          FROM documents
        ),
        hb AS (
          SELECT doc_id,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
              (acc, x) -> (acc * 31 + x) % 1048576) AS b
          FROM w
        ),
        sc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
            CAST(SUM((b * 2654435761) % 4294967296 - 2147483648) AS BIGINT) AS raw_score
          FROM hb GROUP BY doc_id
        ),
        bk AS (
          SELECT doc_id, n_tokens,
            CASE WHEN raw_score > 360000000 * n_tokens THEN 'high'
                 WHEN raw_score > 207000000 * n_tokens THEN 'mid'
                 ELSE 'low' END AS bucket
          FROM sc
        ),
        cum AS (
          SELECT doc_id, bucket, n_tokens,
            CAST(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          FROM bk
        )
        SELECT doc_id, bucket, n_tokens, cum_tokens
        FROM cum
        WHERE cum_tokens <= CASE bucket WHEN 'high' THEN 6000
          WHEN 'mid' THEN 3000 ELSE 1200 END""")),

    // ---- cross-corpus overlap matrix from ONE sketch pass ----
    // "Which of my corpora duplicate each other?" — at 100 TB the naive
    // answer is O(pairs) distinct-joins; the KMV answer is ONE grouped
    // sketch aggregate (k longs per corpus) and pairwise set algebra on
    // the sketches. Fixture: distinct token BIGRAMS per source (~700
    // each, heavy but non-trivial overlap). Every corpus here is below
    // k=1024, so the sketch holds the whole distinct set and the matrix
    // is EXACT — the oracle recomputes every pairwise
    // intersection/union/Jaccard with real distinct-joins and the hash
    // must match bit-for-bit (the estimate regime's error envelope is
    // covered by q155 and KmvSketchSpec).
    QueryDef(
      "q158_source_overlap_matrix",
      (s, dir) => {
        val k = 1024
        val srcs = (0 to 5).map(i => s"src$i")
        val toks = Tables.documents(s, dir)
          .filter(col("source").isin(srcs: _*))
          .select(col("source"),
            expr("regexp_extract_all(lower(text), '[a-z0-9\\']+', 0)").as("__t"))
          .filter(size(col("__t")) >= 2)
        val bigrams = toks.select(col("source"), explode(transform(
            sequence(lit(0), size(col("__t")) - 2),
            i => concat(element_at(col("__t"), i + 1), lit("_"),
              element_at(col("__t"), i + 2)))).as("bg"))
        val sketches = bigrams.groupBy(col("source"))
          .agg(graft.functions.KmvFunctions.kmvSketch(col("bg"), k).as("sk"))
        val a = sketches.select(col("source").as("source_a"), col("sk").as("ska"))
        val b = sketches.select(col("source").as("source_b"), col("sk").as("skb"))
        a.join(b, col("source_a") < col("source_b"))
          .select(col("source_a"), col("source_b"),
            graft.functions.KmvFunctions.kmvSetOps(col("ska"), col("skb"), k).as("ops"))
          .select(col("source_a"), col("source_b"),
            col("ops.intersection").cast(LongType).as("inter_bg"),
            col("ops.union").cast(LongType).as("union_bg"),
            col("ops.jaccard").as("jaccard"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH toks AS (
          SELECT source, regexp_extract_all(lower(text), '[a-z0-9'']+') AS t
          FROM documents
          WHERE source IN ('src0','src1','src2','src3','src4','src5')
        ),
        bi AS (
          SELECT DISTINCT source, t[i] || '_' || t[i+1] AS bg
          FROM toks, UNNEST(range(1, len(t))) AS u(i)
          WHERE len(t) >= 2
        ),
        pairs AS (
          SELECT x.source AS source_a, y.source AS source_b,
            COUNT(*) AS both
          FROM bi x JOIN bi y ON x.bg = y.bg AND x.source < y.source
          GROUP BY 1, 2
        ),
        cards AS (SELECT source, COUNT(*) AS c FROM bi GROUP BY 1)
        SELECT p.source_a, p.source_b,
          CAST(p.both AS BIGINT) AS inter_bg,
          CAST(ca.c + cb.c - p.both AS BIGINT) AS union_bg,
          CAST(p.both AS DOUBLE) / (ca.c + cb.c - p.both) AS jaccard
        FROM pairs p
        JOIN cards ca ON ca.source = p.source_a
        JOIN cards cb ON cb.source = p.source_b
        ORDER BY 1, 2""")),

    // ---- the REST of the Gopher repetition family (Rae et al. 2021
    // §A1.1): top {2,3,4}-gram char coverage + duplicated {5..10}-gram
    // char coverage (q80 carries the line stats + top bigram) ----
    // Repetition is PLANTED per doc (0-3 copies of a spam phrase keyed
    // by doc_id) so every band of the family fires; both engines derive
    // the same text, and the oracle rebuilds all nine fractions from
    // SQL list primitives: same word split, same tie-break (count desc,
    // gram asc), same once-per-token-position duplicated coverage, same
    // single int->double division. One tokenizing generator pass per
    // row Spark-side — no shuffle at any corpus size.
    QueryDef(
      "q188_ngram_coverage",
      (s, dir) => {
        val names = Seq("top_2gram_frac", "top_3gram_frac", "top_4gram_frac") ++
          (5 to 10).map(n => s"dup_${n}gram_frac")
        Tables.documents(s, dir)
          .select(col("doc_id"), expr(
            "concat(text, ' ', repeat('spam spam wonderful spam ', CAST(doc_id % 4 AS INT)))")
            .as("text"))
          .select(col("doc_id"),
            graft.functions.TextNativeFunctions.ngramCoverage(col("text")).as(names))
      },
      Some("""WITH docs AS (
          SELECT doc_id,
            text || ' ' || repeat('spam spam wonderful spam ', CAST(doc_id % 4 AS INT)) AS text
          FROM documents
        ),
        words AS (
          SELECT doc_id, LENGTH(text) AS tlen,
            list_filter(regexp_split_to_array(text, '[ \n]'), x -> x <> '') AS ws
          FROM docs
        ),
        grams AS (
          SELECT w.doc_id, ns.n, t.i AS i,
            array_to_string(w.ws[t.i:t.i+ns.n-1], ' ') AS g
          FROM words w
          CROSS JOIN (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS n) ns
          CROSS JOIN LATERAL unnest(generate_series(1, len(w.ws) - ns.n + 1)) AS t(i)
          WHERE len(w.ws) >= ns.n
        ),
        cnt AS (SELECT doc_id, n, g, COUNT(*) AS c FROM grams GROUP BY doc_id, n, g),
        top AS (
          SELECT doc_id, n, c, g,
            ROW_NUMBER() OVER (PARTITION BY doc_id, n ORDER BY c DESC, g ASC) AS rn
          FROM cnt WHERE n <= 4
        ),
        topv AS (
          SELECT t.doc_id, t.n,
            LEAST(1.0, CAST(t.c * LENGTH(t.g) AS DOUBLE) / CAST(w.tlen AS DOUBLE)) AS frac
          FROM top t JOIN words w ON w.doc_id = t.doc_id
          WHERE t.rn = 1 AND w.tlen > 0
        ),
        dup AS (SELECT doc_id, n, g FROM cnt WHERE n >= 5 AND c > 1),
        cov0 AS (
          SELECT g2.doc_id, g2.n, unnest(generate_series(g2.i, g2.i + g2.n - 1)) AS pos
          FROM grams g2 JOIN dup d ON d.doc_id = g2.doc_id AND d.n = g2.n AND d.g = g2.g
        ),
        cov AS (SELECT DISTINCT doc_id, n, pos FROM cov0),
        dupv AS (
          SELECT c.doc_id, c.n,
            CAST(SUM(LENGTH(w.ws[c.pos])) AS DOUBLE) / CAST(ANY_VALUE(w.tlen) AS DOUBLE) AS frac
          FROM cov c JOIN words w ON w.doc_id = c.doc_id
          WHERE w.tlen > 0
          GROUP BY c.doc_id, c.n
        )
        SELECT w.doc_id,
          COALESCE(MAX(CASE WHEN t.n = 2 THEN t.frac END), 0.0) AS top_2gram_frac,
          COALESCE(MAX(CASE WHEN t.n = 3 THEN t.frac END), 0.0) AS top_3gram_frac,
          COALESCE(MAX(CASE WHEN t.n = 4 THEN t.frac END), 0.0) AS top_4gram_frac,
          COALESCE(MAX(CASE WHEN d.n = 5 THEN d.frac END), 0.0) AS dup_5gram_frac,
          COALESCE(MAX(CASE WHEN d.n = 6 THEN d.frac END), 0.0) AS dup_6gram_frac,
          COALESCE(MAX(CASE WHEN d.n = 7 THEN d.frac END), 0.0) AS dup_7gram_frac,
          COALESCE(MAX(CASE WHEN d.n = 8 THEN d.frac END), 0.0) AS dup_8gram_frac,
          COALESCE(MAX(CASE WHEN d.n = 9 THEN d.frac END), 0.0) AS dup_9gram_frac,
          COALESCE(MAX(CASE WHEN d.n = 10 THEN d.frac END), 0.0) AS dup_10gram_frac
        FROM words w
        LEFT JOIN topv t ON t.doc_id = w.doc_id
        LEFT JOIN dupv d ON d.doc_id = w.doc_id
        GROUP BY w.doc_id"""))
  )

  /** DuckDB CTE fragment producing the q72 exact-Jaccard pair list
    * (threshold 0.4) as `pairs(id_a, id_b)` — shared by the
    * component/survivor oracles so their edge sets are pinned to the
    * already-hash-verified q72 semantics.
    */
  private def pairsCte: String = """sh AS (
          SELECT doc_id, list_distinct(
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            END) AS shingles
          FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS toks
                FROM documents)
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
              len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.4
        )"""
}
