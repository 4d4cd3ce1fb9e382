package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExtOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away quickly"), // near-dup of 1
    (3L, "completely different content about spark query engines and data"),
    (4L, "der hund und die katze sind der beste freund und das ist gut"),
    (5L, "le chat et le chien sont les amis et la maison est grande"))
    .toDF("doc_id", "text")

  test("tokens and shingles") {
    val t = docs.filter($"doc_id" === 1)
      .select(TextOps.tokens($"text").as("t"), TextOps.shingles($"text", 3).as("s"))
      .collect()(0)
    assert(t.getSeq[String](0).take(3) == Seq("the", "quick", "brown"))
    assert(t.getSeq[String](1).head == "the quick brown")
    // n tokens -> n-k+1 shingles
    assert(t.getSeq[String](1).length == t.getSeq[String](0).length - 2)
  }

  test("minhash LSH finds the planted near-dup pair and nothing else") {
    val pairs = NearDup.minhashDupPairs(docs, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs(0).getDouble(2) > 0.5)
  }

  test("minhash signature is stable and length-correct") {
    val sig = docs.select(NearDup.minhashSignature(TextOps.shingles($"text", 3), 32).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sig.forall(_.length == 32))
    val sig2 = docs.select(NearDup.minhashSignature(TextOps.shingles($"text", 3), 32).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sig.toSeq == sig2.toSeq) // deterministic
  }

  test("simhash near-dup via pigeonhole blocks") {
    val pairs = NearDup.simhashDupPairs(docs, maxHamming = 12).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    // identical docs have hamming 0
    val dup = docs.unionAll(docs.withColumn("doc_id", $"doc_id" + 100))
    val exactPairs = NearDup.simhashDupPairs(dup, maxHamming = 0)
    assert(exactPairs.filter($"id_b" === $"id_a" + 100).count() == 5)
  }

  test("exact dedup keeps lowest-order row per key") {
    val withDups = docs.unionAll(docs.withColumn("doc_id", $"doc_id" + 100))
    val out = NearDup.exactDedup(withDups, Seq("text"), "doc_id")
    assert(out.count() == 5)
    assert(out.agg(max($"doc_id")).collect()(0).getLong(0) <= 5L)
  }

  test("language id picks the right marker language") {
    val out = docs.select($"doc_id", TextOps.languageId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(4L) == "de")
    assert(out(5L) == "fr")
  }

  test("quality features are bounded and sane") {
    val out = TextOps.qualityFeatures(docs).collect()
    out.foreach { r =>
      val spaceRatio = r.getAs[Double]("q_space_ratio")
      assert(spaceRatio > 0 && spaceRatio < 0.5)
      assert(r.getAs[Double]("q_n_tokens") > 0)
    }
  }

  test("fingerprints: identical docs share all fingerprints, near-dups share most") {
    val fp = docs.select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(1L) == fp(1L))
    val overlap12 = fp(1L).intersect(fp(2L)).size.toDouble / fp(1L).union(fp(2L)).size
    val overlap13 = fp(1L).intersect(fp(3L)).size.toDouble / fp(1L).union(fp(3L)).size
    assert(overlap12 > 0.5, s"near-dups should share fingerprints ($overlap12)")
    assert(overlap13 < 0.2, s"unrelated docs should not ($overlap13)")
  }

  test("ANN LSH recall against brute force on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    val exact = AnnLsh.topKBruteForce(e, q, k = 5).collect()
    assert(exact.length == 25) // 5 queries x top5
    val approx = AnnLsh.topKLsh(e, q, k = 5)
    val recall = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(approx.collect().map(r => (r.getLong(0), r.getLong(1))).toSet).size / 25.0
    assert(recall > 0.5, s"LSH recall@5 too low: $recall")
  }

  test("cosine near-dup via LSH buckets finds planted duplicate embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // plant near-copies: scaling a vector leaves its cosine at ~1.0
    val planted = e.filter($"vec_id" < 5)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * lit(1.001f)).as("embedding"))
    val corpus = e.unionByName(planted)
    val dups = NearDup.cosineNearDups(corpus, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach { i =>
      assert(dups.contains((i, i + 100000L)), s"planted pair $i not found; got $dups")
    }
    // no false positives: every reported pair really is above threshold
    // (exact verify already filtered) and unrelated base vectors stay out
    assert(dups.forall { case (a, b) => b - a == 100000L },
      s"unexpected non-planted pairs: $dups")
  }

  test("duplicatedSpans finds the planted verbatim substring with exact bounds") {
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ") // 20 shared tokens
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three four five $shared"),
      (3L, "nothing in common here at all with anyone else today")
    ).toDF("doc_id", "text")
    val spans = NearDup.duplicatedSpans(docs, gramK = 8, minTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: shared run at token positions 2..21; doc 2: positions 5..24
    assert(spans == Set((1L, 2L, 21L), (2L, 5L, 24L)), spans.mkString(","))
  }

  test("removeDuplicatedSpans: n_tokens_after equals the re-tokenized clean_text") {
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three four five $shared"),
      (3L, "nothing in common here at all with anyone else today")
    ).toDF("doc_id", "text")
    val out = NearDup.removeDuplicatedSpans(docs, gramK = 8, minTokens = 15)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"),
        r.getAs[Long]("n_tokens_before"), r.getAs[Long]("n_tokens_after"))).toSeq
    assert(out.length === 3)
    out.foreach { case (id, clean, before, after) =>
      // the arithmetic span-subtraction must agree with actually counting
      // the kept tokens (and with the untouched doc's full count)
      val counted = graft.functions.TokenizeUtil.tokens(clean).length.toLong
      assert(after === counted, s"doc $id")
      if (id == 3L) assert(after === before)
      else assert(after < before, s"doc $id should have lost its span")
    }
  }

  test("SemDeDup semantic dedup drops planted duplicates, keeps the lowest id") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // near-copies land in the same k-means cell (cosine ~1.0 -> same argmin)
    val planted = e.filter($"vec_id" < 5)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * lit(1.001f)).as("embedding"))
    val corpus = e.unionByName(planted)
    val out = NearDup.semanticDedup(corpus, threshold = 0.9)
    assert(out.count() == corpus.count()) // every row tagged
    val kept = out.filter($"kept").select("vec_id").collect().map(_.getLong(0)).toSet
    (0L until 5L).foreach { i =>
      assert(kept.contains(i), s"original $i must survive")
      assert(!kept.contains(i + 100000L), s"planted copy of $i must be dropped")
    }
    // determinism: a second run produces the identical keep set
    val kept2 = NearDup.semanticDedup(corpus, threshold = 0.9)
      .filter($"kept").select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == kept2)
  }

  test("semanticDedup: oversized clusters still lose their duplicates (LSH fallback)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(40)
    val planted = e.filter($"vec_id" < 6)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * lit(1.001f)).as("embedding"))
    val corpus = e.unionByName(planted)
    // nlist=1 puts EVERYTHING in one cluster, far above maxClusterSize=10:
    // the old behavior silently kept every duplicate; the LSH fallback
    // must still drop the planted near-copies, flagged as approximate
    val out = NearDup.semanticDedup(corpus, threshold = 0.9, nlist = 1, maxClusterSize = 10)
    assert(out.count() == corpus.count())
    val rows = out.collect()
    assert(rows.forall(_.getString(3) == "lsh"), "oversized cluster must be flagged lsh")
    val kept = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    (0L until 6L).foreach { i =>
      assert(kept.contains(i), s"original $i must survive")
      assert(!kept.contains(i + 100000L), s"planted copy of $i must be dropped (LSH fallback)")
    }
    // bounded clusters keep the exact route and the flag says so
    val exactOut = NearDup.semanticDedup(corpus, threshold = 0.9, nlist = 1, maxClusterSize = 1000)
    assert(exactOut.collect().forall(_.getString(3) == "exact"))
  }

  test("IVF ANN: recall against brute force; probe phase reads a corpus subset") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    val exact = AnnLsh.topKBruteForce(e, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = IvfAnn.topKIvf(e, q, k = 5, nlist = 8, nprobe = 4)
    val approx = ivf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size / 25.0
    assert(recall > 0.5, s"IVF recall@5 too low: $recall")
    // determinism: same call twice gives identical results
    val approx2 = IvfAnn.topKIvf(e, q, k = 5, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == approx2)
    // cells partition the corpus
    val cells = IvfAnn.assign(e, IvfAnn.trainCentroids(e, nlist = 8))
    assert(cells.count() == e.count())
    assert(cells.select("cell").distinct().count() > 1)
  }

  test("IVF quantizer trains on a capped hash-sample without losing recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // cap far below the corpus size: training must run on the sample only,
    // and the resulting quantizer must still assign every vector
    val cents = IvfAnn.trainCentroids(e, nlist = 8, maxTrainRows = 128)
    assert(IvfAnn.assign(e, cents).count() == e.count())
    val centsAgain = IvfAnn.trainCentroids(e, nlist = 8, maxTrainRows = 128)
    assert(cents.collect().map(_.toString).sorted.toSeq ==
      centsAgain.collect().map(_.toString).sorted.toSeq) // deterministic sample + Lloyd
    // a cap so small the sample can't seed nlist cells falls back to full training
    val centsTiny = IvfAnn.trainCentroids(e, nlist = 8, maxTrainRows = 1)
    val centsFull = IvfAnn.trainCentroids(e, nlist = 8)
    assert(centsTiny.collect().map(_.toString).sorted.toSeq ==
      centsFull.collect().map(_.toString).sorted.toSeq)
  }

  test("IVF cell assignment is map-only: no Exchange, no cartesian, native argmin") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = IvfAnn.trainCentroids(e, nlist = 8)
    val plan = IvfAnn.assign(e, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle\n$plan")
    assert(!plan.contains("CartesianProduct"), s"assignment must not cross-join\n$plan")
    assert(!plan.contains("Window"), s"assignment must not window-sort\n$plan")
    assert(plan.contains("argmin_cell"), s"expected the native quantizer expression\n$plan")
  }

  test("ANN rankings run through the bounded-heap TopKPerKey operator") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    val brutePlan = AnnLsh.topKBruteForce(e, q, k = 5).queryExecution.executedPlan.toString
    assert(brutePlan.contains("PartialTopK"), s"brute-force ranking should be heap top-k\n$brutePlan")
    val lshPlan = AnnLsh.topKLsh(e, q, k = 5).queryExecution.executedPlan.toString
    assert(lshPlan.contains("PartialTopK"), s"LSH ranking should be heap top-k\n$lshPlan")
  }

  test("near-dup plan shuffles by band bucket, not O(n^2)") {
    val plan = NearDup.minhashCandidates(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "candidate generation must not be a cross join")
    assert(plan.contains("Exchange hashpartitioning"), "expected a hash shuffle on band buckets")
  }

  test("repetition stats: duplicate lines and top bigram, hand-checked") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "a b\na b\nc d"),                 // 3 lines, "a b" twice
      (2L, "x y x y x y"),                   // no newlines; "x y" 3x, "y x" 2x
      (3L, ""),                              // empty
      (4L, "  spaced  \n\nspaced")           // trims to 2 identical lines
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.functions.TextNativeFunctions.repetitionStats(col("text")).as(Seq(
          "n_lines", "dup_line_frac", "dup_line_char_frac", "top_bigram", "top_bigram_frac")))
      .orderBy("doc_id").collect()

    val r1 = out(0)
    assert(r1.getLong(1) === 3L)
    assert(r1.getDouble(2) === 1.0 / 3.0)            // one duplicate of three
    assert(r1.getDouble(3) === 3.0 / 9.0)            // "a b" chars repeated once
    assert(r1.getString(4) === "a b")                // "a b" 2x beats "b a","b c"... 1x
    assert(r1.getDouble(5) === (2.0 * 3) / 11)

    val r2 = out(1)
    assert(r2.getLong(1) === 1L && r2.getDouble(2) === 0.0)
    assert(r2.getString(4) === "x y" && r2.getDouble(5) === (3.0 * 3) / 11)

    val r3 = out(2)
    assert(r3.getLong(1) === 0L && r3.getDouble(2) === 0.0 &&
      r3.getString(4) === "" && r3.getDouble(5) === 0.0)

    val r4 = out(3)
    assert(r4.getLong(1) === 2L)
    assert(r4.getDouble(2) === 0.5)
    assert(r4.getDouble(3) === 0.5)                  // "spaced" duplicated
  }

  test("ngram coverage: top {2,3,4}-gram and duplicated {5..10}-gram fractions, hand-checked") {
    import org.apache.spark.sql.functions.col
    val names = Seq("top_2gram_frac", "top_3gram_frac", "top_4gram_frac") ++
      (5 to 10).map(n => s"dup_${n}gram_frac")
    val df = Seq(
      (1L, "a b c a b c a b c"), // 9 tokens, 17 chars
      (2L, "a a a a"),           // overlapping top bigram occurrences: cap at 1
      (3L, "")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.functions.TextNativeFunctions.ngramCoverage(col("text")).as(names))
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getDouble(1) === 3.0 * 3 / 17)  // "a b" x3 (smallest of the 3-count ties)
    assert(r1.getDouble(2) === 3.0 * 5 / 17)  // "a b c" x3
    assert(r1.getDouble(3) === 2.0 * 7 / 17)  // 4-gram tie at 2 -> smallest "a b c a"
    assert(r1.getDouble(4) === 9.0 / 17)      // dup 5-grams cover every token
    assert(r1.getDouble(5) === 9.0 / 17)      // dup 6-grams too ("a b c a b c" x2)
    assert(r1.getDouble(6) === 0.0)           // all 7-grams distinct
    assert(r1.getDouble(7) === 0.0 && r1.getDouble(8) === 0.0 && r1.getDouble(9) === 0.0)
    val r2 = out(1)
    assert(r2.getDouble(1) === 1.0)           // "a a" x3 covers 9 of 7 chars -> capped
    assert(r2.getDouble(4) === 0.0)           // only 4 tokens: no 5-grams
    val r3 = out(2)
    assert((1 to 9).forall(i => r3.getDouble(i) === 0.0))
  }

  test("segment dedup: keep-first semantics and reassembly, hand-checked") {
    // 8-token segments; doc 2's first segment equals doc 1's first segment
    // (dropped), its second is novel (kept); doc 3 is an exact copy of
    // doc 1 and must vanish entirely.
    val seg1 = "a b c d e f g h"
    val seg2 = "i j k l m n o p"
    val novel = "q r s t u v w x"
    val df = Seq(
      (1L, s"$seg1 $seg2"),
      (2L, s"$seg1 $novel"),
      (3L, s"$seg1 $seg2")).toDF("doc_id", "text")
    val out = NearDup.dedupSegments(df, segTokens = 8)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getLong(1) === 2L && out(0).getString(2) === s"$seg1 $seg2")
    assert(out(1).getLong(1) === 1L && out(1).getString(2) === novel)
  }

  test("segment dedup: a boilerplate segment with 100k copies collapses map-side") {
    // The skew fixture the scale posture depends on: one segment repeated
    // across 100k docs. With the groupBy keep-first this collapses during
    // partial aggregation; completing quickly with the right answer (one
    // surviving copy at the lowest (doc, idx)) pins both semantics and shape.
    val boiler = "this site uses cookies accept to continue ok"
    val skewed = spark.range(0, 100000)
      .selectExpr("id AS doc_id", s"concat('$boiler', ' unique token ', id, ' pad word here') AS text")
    val out = NearDup.dedupSegments(skewed, segTokens = 8)
    // every doc keeps its unique tail segment; only doc 0 keeps the boilerplate
    assert(out.count() === 100000L)
    val kept0 = out.filter($"doc_id" === 0L).collect()(0)
    assert(kept0.getLong(1) === 2L)
    assert(out.filter($"n_kept_segments" === 2L).count() === 1L)
  }

  test("removeBoilerplateLines: threshold, trim-matching, all-boiler docs survive empty") {
    val docs = Seq(
      (1L, "unique alpha\nFooter line\nbody one"),
      (2L, "  Footer line  \nbody two"),       // trim-matches the footer
      (3L, "Footer line\nbody three"),
      (4L, "only once here\n\ntail"),           // empty line is structure, kept
      (5L, "Footer line")                       // ALL lines boilerplate
    ).toDF("doc_id", "text")
    val out = TextOps.removeBoilerplateLines(docs, minDocs = 3L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 1L, "unique alpha\nbody one")))
    assert(out(1) == ((2L, 2L, 1L, "body two")))
    assert(out(2) == ((3L, 2L, 1L, "body three")))
    assert(out(3) == ((4L, 3L, 0L, "only once here\n\ntail")))
    assert(out(4) == ((5L, 1L, 1L, "")), "an all-boilerplate doc must not vanish")
    // four-doc furniture stays below a five-doc threshold
    val below = TextOps.removeBoilerplateLines(docs, minDocs = 5L)
    assert(below.agg(org.apache.spark.sql.functions.sum("n_lines_removed"))
      .collect()(0).getLong(0) == 0L)
  }

  test("encodingArtifacts: each mojibake family counted, clean text passes") {
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "cafÃ© menu"),                // "Ã©" 2-byte family
      (3L, "itâ€™s here"),          // "â€™" smart-quote family
      (4L, "lost � char and  control"), // replacement + C1
      (5L, ""),
      (6L, "SÃO PAULO, Âge"))           // legit accented uppercase: NOT mojibake
      .toDF("doc_id", "text")
    val out = TextOps.encodingArtifacts(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.map(t => (t._1, t._2, t._4)).toSeq == Seq(
      (1L, 0L, true), (2L, 1L, false), (3L, 1L, false), (4L, 2L, false), (5L, 0L, true),
      (6L, 0L, true)))
    assert(out(1)._3 == 1.0 / 10)  // "cafÃ© menu" is 10 code points
    // map-only: no shuffle
    val plan = TextOps.encodingArtifacts(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("bigramLmScore: hand-checked add-one model over the doc_id%5==0 slice") {
    val docs = Seq(
      (0L, "a b a b"),   // train: transitions (a,b)x2, (b,a)
      (1L, "a b x"),     // (a,b) seen, (b,x) unseen
      (2L, "zz qq"),     // fully out-of-model
      (5L, "a b c"),     // train: (a,b), (b,c)
      (6L, ""))          // no transitions → absent from output
      .toDF("doc_id", "text")
    // model: c(a,b)=3, c(b,a)=1, c(b,c)=1; prefixes a→3, b→2; V={a,b,c}=3
    val out = TextOps.bigramLmScore(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((0L, 3L, 0L), (1L, 2L, 1L), (2L, 1L, 1L), (5L, 2L, 0L)))
    // doc 0: (4/6 + 2/5 + 4/6)/3; doc 1: (4/6 + 1/5)/2; doc 2: 1/3
    assert(math.abs(out(0)._4 - (4.0 / 6 + 2.0 / 5 + 4.0 / 6) / 3) < 1e-9)
    assert(math.abs(out(1)._4 - (4.0 / 6 + 1.0 / 5) / 2) < 1e-9)
    assert(math.abs(out(2)._4 - 1.0 / 3) < 1e-9)
    // fluent text under the model outranks out-of-model text
    assert(out(0)._4 > out(2)._4)
  }

  test("bigramLmScore plan: no collect, model joined not broadcast-forced") {
    val docs = (0L to 40L).map(i => (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7}"))
      .toDF("doc_id", "text")
    val plan = TextOps.bigramLmScore(docs).queryExecution.optimizedPlan.toString
    // the model sides join; only the 1-row vocabulary carries a hint
    assert(!plan.contains("CollectLimit"))
    val out = TextOps.bigramLmScore(docs).collect()
    assert(out.length == 41 && out.forall(_.getLong(1) == 2L))
  }

  test("chunkDocuments: window math, overlap, short tail, empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),  // 10 tokens
      (2L, (1 to 11).map(i => s"t$i").mkString(" ")),  // short tail chunk
      (3L, "a b"),                                     // <= chunk → 1 chunk
      (4L, ""))                                        // nothing
      .toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(docs, chunkTokens = 4, overlapTokens = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 5 && d2.last._4 == "t9 t10 t11" && d2.last._3 == 3L)
    assert(out.filter(_._1 == 3L).map(_._4).toSeq == Seq("a b"))
    assert(!out.exists(_._1 == 4L))
    // every adjacent pair overlaps by exactly `overlap` tokens (full windows)
    assert(d1.sliding(2).forall { case Array(a, b) =>
      a._4.split(" ").takeRight(2).sameElements(b._4.split(" ").take(2))
    })
    // map-only: no shuffle in the plan
    val plan = TextOps.chunkDocuments(docs, chunkTokens = 4, overlapTokens = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle\n$plan")
  }
}
