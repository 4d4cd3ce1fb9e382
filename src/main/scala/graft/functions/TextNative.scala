package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenization + shingling (shared by the sketch expressions).
  * Tokens are maximal runs of [a-z0-9'] over the lowercased text — the
  * same token definition as TextOps.tokens' regex split, in one JVM scan.
  */
object TokenizeUtil {
  def tokens(text: String): Array[String] = {
    val s = text.toLowerCase
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !isTokenChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && isTokenChar(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '\''

  /** Tokens of `text` packed into ONE ASCII byte buffer, joined by single
    * spaces, with per-token offsets: token i occupies `buf[starts(i),
    * ends(i))`. Because a k-token shingle joined by single spaces is a
    * CONTIGUOUS slice `buf[starts(i), ends(i+k-1))`, and token chars are
    * pure ASCII (runs of [a-z0-9']), that slice is byte-identical to
    * `shingles(text,k)(i).getBytes("UTF-8")` — the sketch hot paths hash
    * these windows in place, with zero per-shingle String/encode/copy
    * work. Same tokenization as `tokens` (whole-string toLowerCase first,
    * so exotic case mappings like U+212A → 'k' agree).
    */
  final class Packed(val buf: Array[Byte], val starts: Array[Int],
      val ends: Array[Int], val n: Int)

  def packed(text: String): Packed = {
    val s = text.toLowerCase
    val len = s.length
    val buf = new Array[Byte](len)
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var n = 0
    var w = 0
    var i = 0
    while (i < len) {
      while (i < len && !isTokenChar(s.charAt(i))) i += 1
      if (i < len) {
        if (n > 0) { buf(w) = ' '.toByte; w += 1 }
        starts(n) = w
        while (i < len && isTokenChar(s.charAt(i))) {
          buf(w) = s.charAt(i).toByte; w += 1; i += 1
        }
        ends(n) = w
        n += 1
      }
    }
    new Packed(buf, starts, ends, n)
  }

  /** k-token shingles joined by single spaces; if fewer than k tokens, one
    * shingle with all tokens (mirrors TextOps.shingles).
    */
  def shingles(text: String, k: Int): Array[String] = {
    val toks = tokens(text)
    if (toks.length < k) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - k + 1)(i => {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      sb.toString
    })
  }
}

/** Generator: text → one (band, bucket) row per LSH band, with the whole
  * tokenize → shingle → minhash → band pipeline fused into a single
  * evaluation per input row.
  *
  * Why a Generator and not scalar expressions composed in the DataFrame:
  * (a) Catalyst's InferFiltersFromGenerate plants a
  * `size(expr)>0 AND isnotnull(expr)` filter under a Generate, and
  * CollapseProject inlines scalar children — both re-evaluate an expensive
  * child expression several times per row (observed 50s for a 10k-doc
  * corpus vs 0.2s for the fused pipeline); (b) higher-order-function
  * tokenization is interpreted per lambda. One Generator eval per row
  * sidesteps all of it.
  */
case class MinHashBandsGen(
    child: Expression,
    shingleK: Int,
    numHashes: Int,
    bands: Int) extends UnaryExpression with CollectionGenerator with CodegenFallback {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def elementSchema: StructType = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val text = v.asInstanceOf[UTF8String].toString
    // shingle i = packed.buf[starts(i), ends(i+k-1)) — hash windows of one
    // packed buffer in place (byte-identical to the joined-String route,
    // which paid a String build + UTF-8 encode per shingle)
    val p = TokenizeUtil.packed(text)
    val nShingles = if (p.n < shingleK) 1 else p.n - shingleK + 1
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < nShingles) {
      val off = if (p.n == 0) 0 else p.starts(i)
      val end =
        if (p.n == 0) 0
        else if (p.n < shingleK) p.ends(p.n - 1)
        else p.ends(i + shingleK - 1)
      val h1 = XxHash64.hash(p.buf, off, end - off, 0L)
      val h2 = XxHash64.hash(p.buf, off, end - off, 1L) | 1L
      var j = 0
      var h = h1
      while (j < numHashes) {
        if (h < mins(j)) mins(j) = h
        h += h2
        j += 1
      }
      i += 1
    }
    val r = numHashes / bands
    val buf = new Array[Byte](8 * r)
    val rows = new Array[InternalRow](bands)
    var b = 0
    while (b < bands) {
      var j = 0
      while (j < r) {
        val x = mins(b * r + j)
        var k = 0
        while (k < 8) { buf(j * 8 + k) = ((x >>> (8 * k)) & 0xff).toByte; k += 1 }
        j += 1
      }
      rows(b) = InternalRow(b, XxHash64.hash(buf, b.toLong))
      b += 1
    }
    rows.iterator
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "minhash_bands_gen"
}

/** Generator: text → one (pos, gram_hash) row per k-token-gram start
  * position — the duplicated-spans map stage with the gram STRING
  * replaced by its 64-bit XXH64 (hash of the space-joined gram's UTF-8
  * bytes, computed over a window of one packed token buffer).
  *
  * Why (guide §2.3, shuffle keys instead of payloads): the downstream
  * cross-doc test only ever compares grams for EQUALITY (window
  * partitioned by gram), so an 8-byte hash key carries the same
  * information as the ~8·avg-token-len gram string at ~6× fewer shuffle
  * bytes and long-vs-string sort comparisons. It also fuses
  * tokenize→gram into one eval per row: the HOF formulation paid the
  * regex tokenizer twice per row (once under the pushed-down
  * `size(tokens)>=k` Filter, once in the Project — same Catalyst
  * duplication MinHashBandsGen's doc describes) plus an O(tokens·k)
  * string build per row.
  *
  * Collision bound: distinct grams colliding on 64 bits could mark a
  * position duplicated that is not. With G distinct grams the expected
  * number of colliding pairs is ~G²/2⁶⁵ — at the 10⁷-gram scale of the
  * ×10 fixture that is ~10⁻⁵ expected pairs, zero observed (same
  * accepted bound as the winnowing fingerprint family; the hash-exact
  * oracle gate would surface one).
  *
  * Emits nothing when the document has fewer than gramK tokens (the old
  * formulation's explicit Filter, folded in).
  */
case class GramHashGen(child: Expression, gramK: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {
  require(gramK >= 1, "gramK must be >= 1")

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram_hash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val p = TokenizeUtil.packed(v.asInstanceOf[UTF8String].toString)
    if (p.n < gramK) return Iterator.empty
    val out = new Array[InternalRow](p.n - gramK + 1)
    var i = 0
    while (i < out.length) {
      val off = p.starts(i)
      val end = p.ends(i + gramK - 1)
      out(i) = InternalRow(i, XxHash64.hash(p.buf, off, end - off, 0L))
      i += 1
    }
    out.iterator
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "gram_hash_gen"
}

/** Generator: text → one (w1, w2) row per adjacent token pair — the
  * bigram-LM transition stream fused into one tokenizing eval per row.
  * Replaces `filter(size(tokens)>=2)` + `explode(transform(sequence(...),
  * struct(element_at...)))`, whose pushed-down Filter re-evaluated the
  * regex tokenizer per row a second time (the same Catalyst duplication
  * MinHashBandsGen's doc describes). Emits the token STRINGS (they are
  * join/group keys downstream — exact parity, no hashing). Documents
  * with fewer than two tokens emit nothing, like the old Filter.
  */
case class BigramGen(child: Expression)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def elementSchema: StructType = StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val p = TokenizeUtil.packed(v.asInstanceOf[UTF8String].toString)
    if (p.n < 2) return Iterator.empty
    val toks = new Array[UTF8String](p.n)
    var i = 0
    while (i < p.n) {
      toks(i) = UTF8String.fromBytes(p.buf, p.starts(i), p.ends(i) - p.starts(i))
      i += 1
    }
    val out = new Array[InternalRow](p.n - 1)
    i = 0
    while (i < out.length) {
      out(i) = InternalRow(toks(i), toks(i + 1))
      i += 1
    }
    out.iterator
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "bigram_gen"
}

/** Generator: text → one row per token (the token string) — `explode` of
  * the tokenizer without the array materialization, and without the
  * `size(...)>0` filter InferFiltersFromGenerate plants under an explode
  * (whose pushdown re-evaluates the tokenizer per row — see BigramGen).
  */
case class TokensGen(child: Expression)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def elementSchema: StructType = StructType(Seq(
    StructField("tok", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val p = TokenizeUtil.packed(v.asInstanceOf[UTF8String].toString)
    val out = new Array[InternalRow](p.n)
    var i = 0
    while (i < p.n) {
      out(i) = InternalRow(
        UTF8String.fromBytes(p.buf, p.starts(i), p.ends(i) - p.starts(i)))
      i += 1
    }
    out.iterator
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "tokens_gen"
}

/** text → number of word tokens — `size(filter(split(lower(text),
  * "[^a-z0-9']+"), len>0))` without materializing the token array or
  * paying the interpreted higher-order filter: one scan counting token
  * runs (same token definition as TokenizeUtil, proven split-equivalent
  * by the q72 oracle family).
  */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Kernels.tokenCount(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "token_count"
}

/** text → array<string> of distinct k-token shingles, natively (for exact
  * Jaccard verification without HOF tokenization).
  */
case class ShingleSetExpr(child: Expression, shingleK: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Kernels.shingleSet(input.asInstanceOf[UTF8String], shingleK)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleSet($c, $shingleK)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "shingle_set"
}

/** text → array<long> of distinct sorted shingle hashes (the Jaccard
  * set proxy — see Kernels.shingleHashSet for the collision bound).
  */
case class ShingleHashSetExpr(child: Expression, shingleK: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Kernels.shingleHashSet(input.asInstanceOf[UTF8String], shingleK)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleHashSet($c, $shingleK)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "shingle_hash_set"
}

/** text → 64-bit SimHash over word tokens, fused tokenize+hash+vote. */
case class SimHashTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Kernels.simhashText(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhashText($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "simhash_text"
}

/** text → array<long> winnowing fingerprint (Schleimer et al. shape):
  * hash k-token shingles, sliding-window minima (monotonic deque, O(n)),
  * distinct — fully fused; the HOF formulation re-evaluated the regex
  * tokenizer per shingle (quadratic per row).
  */
case class FingerprintExpr(child: Expression, shingleK: Int, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Kernels.fingerprint(input.asInstanceOf[UTF8String], shingleK, window)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.fingerprint($c, $shingleK, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "winnow_fingerprint"
}

/** Generator (always exactly ONE output row): Gopher-style repetition
  * statistics of a document (Rae et al. 2021 §A1.1 quality-filter shape) —
  * duplicate-line fractions and the most frequent word bigram — fused into
  * one pass. A single-row Generator rather than a struct-valued scalar
  * because CollapseProject would inline a scalar into one evaluation PER
  * EXTRACTED FIELD (see MinHashBandsGen's doc for the measured blowup).
  *
  * Cross-engine parity contract (the DuckDB oracle mirrors each rule):
  * lines split on '\n' and space-trimmed (ONLY spaces — SQL TRIM
  * semantics, not Java's), empties dropped; words split on space or
  * newline, empties dropped; the top bigram is the most frequent, ties
  * broken by smallest string; lengths are code-point counts (Spark
  * length() / DuckDB LENGTH); fractions are exact integer ratios cast to
  * double.
  */
case class RepetitionStatsGen(child: Expression)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def elementSchema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_bigram", StringType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))

  private def spaceTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    val text = if (v == null) "" else v.asInstanceOf[UTF8String].toString
    // line duplication
    val lines = text.split('\n').iterator.map(spaceTrim).filter(_.nonEmpty).toArray
    val nLines = lines.length.toLong
    var lenAll = 0L
    var lenDistinct = 0L
    val seen = new java.util.HashSet[String]()
    // code-point counts, matching Spark length() / DuckDB LENGTH semantics
    def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong
    var i = 0
    while (i < lines.length) {
      lenAll += cpLen(lines(i))
      if (seen.add(lines(i))) lenDistinct += cpLen(lines(i))
      i += 1
    }
    val dupLineFrac =
      if (nLines == 0) 0.0 else (nLines - seen.size).toDouble / nLines.toDouble
    val dupLineCharFrac =
      if (lenAll == 0) 0.0 else (lenAll - lenDistinct).toDouble / lenAll.toDouble
    // top word bigram (words split on space/newline, empties dropped —
    // bigrams DO span line boundaries, like the oracle's regexp split)
    val words = text.split(Array(' ', '\n')).iterator.filter(_.nonEmpty).toArray
    var topBigram = ""
    var topCount = 0
    if (words.length >= 2) {
      val counts = new java.util.HashMap[String, Int]()
      var j = 0
      while (j + 1 < words.length) {
        val bg = words(j) + " " + words(j + 1)
        val c = counts.merge(bg, 1, Integer.sum)
        if (c > topCount || (c == topCount && bg.compareTo(topBigram) < 0)) {
          topCount = c; topBigram = bg
        }
        j += 1
      }
      // the running argmax above can miss a smaller-string tie that never
      // led; settle ties exactly in one ordered pass
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == topCount && e.getKey.compareTo(topBigram) < 0) topBigram = e.getKey
      }
    }
    val topFrac =
      if (text.isEmpty || topCount == 0) 0.0
      else (topCount.toLong * cpLen(topBigram)).toDouble / cpLen(text).toDouble
    Iterator.single(InternalRow(
      nLines, dupLineFrac, dupLineCharFrac, UTF8String.fromString(topBigram), topFrac))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

/** Generator (always exactly ONE output row): the REST of the Gopher
  * repetition family (Rae et al. 2021 §A1.1) beyond RepetitionStatsGen's
  * line stats + top bigram — the fraction of characters inside the most
  * frequent {2,3,4}-gram and inside all DUPLICATED {5..10}-grams — fused
  * into one tokenizing pass (one word split, nine counting passes over
  * the in-memory token array; O(9 × tokens) per row, no shuffle at any
  * corpus size).
  *
  * Cross-engine parity contract (the DuckDB oracle mirrors each rule):
  * words split on space or newline, empties dropped; n-gram strings are
  * the n words joined by single spaces; the top n-gram is the most
  * frequent with ties broken by smallest string; top coverage =
  * occurrences × gram code-point length / text code-point length;
  * duplicated coverage counts each TOKEN POSITION once (Gopher's
  * "fraction of characters contained within duplicate n-grams"): the
  * code-point sum of tokens covered by any n-gram occurring twice or
  * more, over the text code-point length. Fractions are exact integer
  * ratios cast to double. Duplicated coverage is ≤1 by construction
  * (distinct positions, and spaces never count); top coverage CAN
  * exceed 1 when occurrences of the same gram overlap ("a a a a" has
  * 3 × "a a"), so it is capped at 1.0 explicitly — mirrored in the
  * oracle with LEAST.
  */
case class NgramCoverageGen(child: Expression)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def elementSchema: StructType = StructType(
    Seq(2, 3, 4).map(n => StructField(s"top_${n}gram_frac", DoubleType, nullable = false)) ++
    (5 to 10).map(n => StructField(s"dup_${n}gram_frac", DoubleType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    val text = if (v == null) "" else v.asInstanceOf[UTF8String].toString
    def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong
    val tLen = cpLen(text)
    val words = text.split(Array(' ', '\n')).iterator.filter(_.nonEmpty).toArray
    val wLens = words.map(cpLen)

    // grams materialized ONCE per n and indexed by both the counting
    // and the coverage pass — gram string construction dominates the
    // per-row cost, so rebuilding each gram twice would double it
    def gramsFor(n: Int): Array[String] = Array.tabulate(words.length - n + 1) { i =>
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' '); sb.append(words(i + j)); j += 1 }
      sb.toString
    }

    def topFrac(n: Int): Double = {
      if (tLen == 0L || words.length < n) return 0.0
      val grams = gramsFor(n)
      val counts = new java.util.HashMap[String, Int]()
      var i = 0
      while (i < grams.length) { counts.merge(grams(i), 1, Integer.sum); i += 1 }
      var topG: String = null
      var topC = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > topC ||
            (e.getValue == topC && e.getKey.compareTo(topG) < 0)) {
          topC = e.getValue; topG = e.getKey
        }
      }
      math.min(1.0, (topC.toLong * cpLen(topG)).toDouble / tLen.toDouble)
    }

    def dupFrac(n: Int): Double = {
      if (tLen == 0L || words.length < n) return 0.0
      val grams = gramsFor(n)
      val counts = new java.util.HashMap[String, Int]()
      var i = 0
      while (i < grams.length) { counts.merge(grams(i), 1, Integer.sum); i += 1 }
      val covered = new Array[Boolean](words.length)
      i = 0
      while (i < grams.length) {
        if (counts.get(grams(i)) > 1) {
          var j = 0
          while (j < n) { covered(i + j) = true; j += 1 }
        }
        i += 1
      }
      var cov = 0L
      i = 0
      while (i < words.length) { if (covered(i)) cov += wLens(i); i += 1 }
      cov.toDouble / tLen.toDouble
    }

    Iterator.single(InternalRow(
      topFrac(2), topFrac(3), topFrac(4),
      dupFrac(5), dupFrac(6), dupFrac(7), dupFrac(8), dupFrac(9), dupFrac(10)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "ngram_coverage"
}

/** Hashed linear text classifier — the fastText-shape quality filter
  * every production corpus pipeline runs (score each doc with a linear
  * model over hashed token features, keep docs above threshold), fused
  * into ONE tokenizing pass per row: no shuffle, no per-token explode,
  * map-only at any scale. Feature hashing: token → bucket in [0, 2^20)
  * via the 31-polynomial rolling hash over its chars (overflow-free —
  * the accumulator stays under 2^25). Two weight sources: a TRAINED
  * vector supplied by the caller (broadcast `Array[Float]` of 2^20
  * entries — the form a fastText-style model exports; see
  * `TextNativeFunctions.classifierScore(text, weights)` and the
  * weights-from-table loader), or, with no vector given, the
  * deterministic zero-config pseudo-model
  * w(b) = ((b·2654435761) mod 2^32) − 2^31 — integer weights make
  * cross-engine score sums exact. Emits one row:
  * (n_tokens, raw_score = Σ w(bucket(tok)), score = raw/n, keep = raw>0).
  */
case class ClassifierScoreGen(child: Expression,
    weights: Option[org.apache.spark.broadcast.Broadcast[Array[Float]]] = None)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  // trained path scores with floats → raw is a DOUBLE; the zero-config
  // pseudo-model keeps its integer LONG raw (engine-exact by construction)
  override def elementSchema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("raw_score", if (weights.isDefined) DoubleType else LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("keep", BooleanType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    val text = if (v == null) "" else v.asInstanceOf[UTF8String].toString
    val toks = TokenizeUtil.tokens(text)
    val n = toks.length.toLong
    weights match {
      case Some(bc) =>
        val w = bc.value
        require(w.length == ClassifierScoreGen.NumBuckets,
          s"classifier weight vector must have ${ClassifierScoreGen.NumBuckets} entries, got ${w.length}")
        var raw = 0.0
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          var h = 0L
          var j = 0
          while (j < t.length) { h = (h * 31L + t.charAt(j).toLong) % 1048576L; j += 1 }
          raw += w(h.toInt)
          i += 1
        }
        val score = if (n == 0) 0.0 else raw / n.toDouble
        Iterator.single(InternalRow(n, raw, score, raw > 0.0))
      case None =>
        var raw = 0L
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          var h = 0L
          var j = 0
          while (j < t.length) { h = (h * 31L + t.charAt(j).toLong) % 1048576L; j += 1 }
          raw += ((h * 2654435761L) % 4294967296L) - 2147483648L
          i += 1
        }
        val score = if (n == 0) 0.0 else raw.toDouble / n.toDouble
        Iterator.single(InternalRow(n, raw, score, raw > 0L))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "classifier_score"
}

object ClassifierScoreGen {
  /** Feature-hash bucket count (2^20) — fixed so a weight vector and the
    * scorer can never disagree on dimensionality.
    */
  val NumBuckets: Int = 1048576
}

object TextNativeFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  def minhashBandsGen(text: Column, shingleK: Int, numHashes: Int, bands: Int): Column =
    toCol(MinHashBandsGen(toExpr(text), shingleK, numHashes, bands))

  def gramHashes(text: Column, gramK: Int): Column =
    toCol(GramHashGen(toExpr(text), gramK))

  def bigrams(text: Column): Column = toCol(BigramGen(toExpr(text)))

  def tokensGen(text: Column): Column = toCol(TokensGen(toExpr(text)))

  def repetitionStats(text: Column): Column =
    toCol(RepetitionStatsGen(toExpr(text)))

  def ngramCoverage(text: Column): Column =
    toCol(NgramCoverageGen(toExpr(text)))

  def shingleSet(text: Column, shingleK: Int): Column =
    toCol(ShingleSetExpr(toExpr(text), shingleK))

  def shingleHashSet(text: Column, shingleK: Int): Column =
    toCol(ShingleHashSetExpr(toExpr(text), shingleK))

  def tokenCount(text: Column): Column = toCol(TokenCountExpr(toExpr(text)))

  def simhashText(text: Column): Column = toCol(SimHashTextExpr(toExpr(text)))

  def fingerprint(text: Column, shingleK: Int = 3, window: Int = 4): Column =
    toCol(FingerprintExpr(toExpr(text), shingleK, window))

  def classifierScore(text: Column): Column =
    toCol(ClassifierScoreGen(toExpr(text)))

  /** Score with a TRAINED weight vector (fastText-shape export): one
    * float per feature-hash bucket, broadcast once and gathered map-side —
    * the expression ships only the broadcast handle, so a 4 MB model costs
    * one torrent fetch per executor, not one copy per task.
    */
  def classifierScore(text: Column,
      weights: org.apache.spark.broadcast.Broadcast[Array[Float]]): Column =
    toCol(ClassifierScoreGen(toExpr(text), Some(weights)))

  /** Convenience overload: broadcasts the vector through the active session. */
  def classifierScore(text: Column, weights: Array[Float]): Column = {
    require(weights.length == ClassifierScoreGen.NumBuckets,
      s"classifier weight vector must have ${ClassifierScoreGen.NumBuckets} entries, got ${weights.length}")
    classifierScore(text,
      org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(weights))
  }

  /** Load a (bucket, weight) table — the on-disk form a training job
    * writes — into the dense 2^20-float vector the scorer gathers from.
    * Sparse: absent buckets weigh 0. The collect is model-sized (≤ 2^20
    * rows ≈ 4 MB), never corpus-sized.
    */
  def classifierWeightsFromTable(df: org.apache.spark.sql.DataFrame,
      bucketCol: String = "bucket", weightCol: String = "weight"): Array[Float] = {
    val w = new Array[Float](ClassifierScoreGen.NumBuckets)
    df.select(org.apache.spark.sql.functions.col(bucketCol).cast("int"),
        org.apache.spark.sql.functions.col(weightCol).cast("float"))
      .collect().foreach { r =>
        val b = r.getInt(0)
        require(b >= 0 && b < ClassifierScoreGen.NumBuckets,
          s"classifier weight bucket $b outside [0, ${ClassifierScoreGen.NumBuckets})")
        w(b) = r.getFloat(1)
      }
    w
  }
}
