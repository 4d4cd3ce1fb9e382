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
    val shingles = TokenizeUtil.shingles(text, shingleK)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val bytes = shingles(i).getBytes("UTF-8")
      val h1 = XxHash64.hash(bytes, 0L)
      val h2 = XxHash64.hash(bytes, 1L) | 1L
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

object TextNativeFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  def minhashBandsGen(text: Column, shingleK: Int, numHashes: Int, bands: Int): Column =
    toCol(MinHashBandsGen(toExpr(text), shingleK, numHashes, bands))

  def shingleSet(text: Column, shingleK: Int): Column =
    toCol(ShingleSetExpr(toExpr(text), shingleK))

  def simhashText(text: Column): Column = toCol(SimHashTextExpr(toExpr(text)))

  def fingerprint(text: Column, shingleK: Int = 3, window: Int = 4): Column =
    toCol(FingerprintExpr(toExpr(text), shingleK, window))
}
