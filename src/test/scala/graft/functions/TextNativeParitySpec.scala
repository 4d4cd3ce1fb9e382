package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the round-16 per-task rewrites of the text hot paths to the exact
  * formulations they replaced:
  *   - TokenizeUtil.packed is byte-identical to tokens joined by spaces,
  *     and every k-token window slice equals the joined shingle's UTF-8
  *     bytes (the property MinHashBandsGen/GramHashGen hash through);
  *   - MinHashBandsGen (packed-buffer) emits the same (band, bucket)
  *     rows as the joined-String + getBytes reference;
  *   - GramHashGen emits exactly the old posexplode positions with the
  *     hash of the old gram string;
  *   - BigramGen / TokensGen emit exactly the old explode streams.
  */
class TextNativeParitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog and runs far away home",
    "", "   ", "a", "one two", "don't stop-believing... hold'on",
    "x " * 40 + "tail", "UPPER Case MiXeD 123 numbers42",
    "unicode K elvin and İstanbul café naïve",
    "short doc", "a b c d e f g h i j k l m n o p q r s t")

  test("packed buffer is byte-identical to tokens joined by single spaces") {
    samples.foreach { text =>
      val toks = TokenizeUtil.tokens(text)
      val p = TokenizeUtil.packed(text)
      assert(p.n === toks.length)
      val joined = toks.mkString(" ").getBytes("UTF-8")
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(p.buf, 0, if (p.n == 0) 0 else p.ends(p.n - 1)),
        joined), s"buffer mismatch for: $text")
      toks.indices.foreach { i =>
        assert(new String(p.buf, p.starts(i), p.ends(i) - p.starts(i), "UTF-8")
          === toks(i))
      }
    }
  }

  test("every packed k-window slice equals the joined shingle's UTF-8 bytes") {
    for (text <- samples; k <- Seq(2, 3, 8)) {
      val p = TokenizeUtil.packed(text)
      val sh = TokenizeUtil.shingles(text, k)
      if (p.n >= k) {
        assert(sh.length === p.n - k + 1)
        sh.indices.foreach { i =>
          val slice = java.util.Arrays.copyOfRange(p.buf, p.starts(i), p.ends(i + k - 1))
          assert(java.util.Arrays.equals(slice, sh(i).getBytes("UTF-8")),
            s"k=$k i=$i text=$text")
        }
      } else {
        // fewer than k tokens: one shingle of all tokens = the whole buffer
        assert(sh.length === 1)
        val whole = java.util.Arrays.copyOfRange(
          p.buf, 0, if (p.n == 0) 0 else p.ends(p.n - 1))
        assert(java.util.Arrays.equals(whole, sh(0).getBytes("UTF-8")))
      }
    }
  }

  test("MinHashBandsGen matches the joined-String + getBytes reference") {
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id",
        TextNativeFunctions.minhashBandsGen($"text", 3, 64, 16).as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expect = samples.zipWithIndex.flatMap { case (text, id) =>
      val mins = Array.fill(64)(Long.MaxValue)
      TokenizeUtil.shingles(text, 3).foreach { s =>
        val bytes = s.getBytes("UTF-8")
        val h1 = XxHash64.hash(bytes, 0L)
        val h2 = XxHash64.hash(bytes, 1L) | 1L
        var j = 0; var h = h1
        while (j < 64) { if (h < mins(j)) mins(j) = h; h += h2; j += 1 }
      }
      (0 until 16).map { b =>
        val buf = new Array[Byte](8 * 4)
        var j = 0
        while (j < 4) {
          val x = mins(b * 4 + j)
          var k = 0
          while (k < 8) { buf(j * 8 + k) = ((x >>> (8 * k)) & 0xff).toByte; k += 1 }
          j += 1
        }
        (id.toLong, b, XxHash64.hash(buf, b.toLong))
      }
    }.toSet
    assert(got === expect)
  }

  test("GramHashGen emits the old positions with the hash of the old gram string") {
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id",
        TextNativeFunctions.gramHashes($"text", 8).as(Seq("pos", "g")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expect = samples.zipWithIndex.flatMap { case (text, id) =>
      val toks = TokenizeUtil.tokens(text)
      if (toks.length < 8) Seq.empty
      else (0 to toks.length - 8).map { i =>
        val gram = toks.slice(i, i + 8).mkString(" ")
        (id.toLong, i, XxHash64.hash(gram.getBytes("UTF-8"), 0L))
      }
    }.toSet
    assert(got === expect)
  }

  test("shingleHashSet is the distinct-hash image of the string shingle set") {
    for (text <- samples; k <- Seq(2, 3)) {
      val strings = TokenizeUtil.shingles(text, k).distinct
      val expect = strings.map(s => XxHash64.hash(s.getBytes("UTF-8"), 0L)).distinct.sorted
      val df = Seq(Tuple1(text)).toDF("text")
      val got = df.select(TextNativeFunctions.shingleHashSet($"text", k).as("h"))
        .collect().head.getSeq[Long](0)
      assert(got === expect.toSeq, s"k=$k text=$text")
      // set size preserved => Jaccard over hashed sets == over strings
      assert(got.length === strings.length)
    }
  }

  test("TokenCountExpr matches size(filter(split(...))) and TokenizeUtil") {
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id",
        TextNativeFunctions.tokenCount($"text").as("n"),
        size(filter(split(lower($"text"), "[^a-z0-9']+"), t => length(t) > 0))
          .cast("long").as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"id=${r.getLong(0)}")
      assert(r.getLong(1) ===
        TokenizeUtil.tokens(samples(r.getLong(0).toInt)).length.toLong)
    }
  }

  test("DotExact48Expr matches the zip_with/aggregate/DECIMAL formulation") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val Dec0 = DecimalType(38, 0)
    val P48 = java.lang.Double.parseDouble("281474976710656")
    def oldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(a, b, (x, y) => floor(x.cast(DoubleType) * y.cast(DoubleType) * lit(P48)).cast(Dec0)),
        lit(0).cast(Dec0),
        (acc, v) => (acc + v).cast(Dec0)).cast("string").cast(DoubleType) / lit(P48)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong,
        Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f),
        Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select($"id",
        SketchFunctions.dotExact48($"a", $"b").as("neu"),
        oldDot($"a", $"b").as("alt"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id=${r.getLong(0)}")
    }
  }

  test("BigramGen / TokensGen emit the old explode streams in order") {
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val gotBi = df.select($"id", TextNativeFunctions.bigrams($"text").as(Seq("w1", "w2")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expBi = samples.zipWithIndex.flatMap { case (text, id) =>
      val toks = TokenizeUtil.tokens(text)
      toks.sliding(2).filter(_.length == 2).map(p => (id.toLong, p(0), p(1)))
    }
    assert(gotBi.sorted.toSeq === expBi.sorted.toSeq)
    val gotToks = df.select($"id", TextNativeFunctions.tokensGen($"text").as(Seq("tok")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expToks = samples.zipWithIndex.flatMap { case (text, id) =>
      TokenizeUtil.tokens(text).map(t => (id.toLong, t)) }
    assert(gotToks.sorted.toSeq === expToks.sorted.toSeq)
  }
}
