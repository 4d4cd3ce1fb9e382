package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlNativeFunctions

class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val suffixes = Seq("com", "org", "uk", "co.uk", "io", "github.io")

  private def domainOf(host: String): Option[String] =
    Seq(Option(host)).toDF("h")
      .select(UrlNativeFunctions.registrableDomain(col("h"), suffixes).as("d"))
      .collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getString(0))
    }

  test("registrable domain follows the public-suffix matching rules") {
    assert(domainOf("example.com") == Some("example.com"))
    assert(domainOf("www.example.com") == Some("example.com"))
    // longest suffix wins: co.uk beats uk
    assert(domainOf("en.example.co.uk") == Some("example.co.uk"))
    // private-registry suffix: a project site registers UNDER github.io
    assert(domainOf("myproj.github.io") == Some("myproj.github.io"))
    assert(domainOf("cdn.myproj.github.io") == Some("myproj.github.io"))
    // unknown TLD: the implicit * rule — last label is the suffix
    assert(domainOf("a.b.unknowntld") == Some("b.unknowntld"))
    // a bare suffix, a single label, and junk have no registrable domain
    assert(domainOf("com") == None)
    assert(domainOf("github.io") == None)
    assert(domainOf("localhost") == None)
    assert(domainOf("bad..host") == None)
    assert(domainOf("") == None)
    // normalization: case, port, trailing dot
    assert(domainOf("WWW.Example.COM:8080") == Some("example.com"))
    assert(domainOf("example.com.") == Some("example.com"))
  }

  test("blocklist filtering drops blocked registrable domains map-only") {
    val df = Seq(
      (1L, "https://en.keep.com/p/1"),
      (2L, "https://www.bad.co.uk/x"),
      (3L, "https://cdn.bad.co.uk:443/y"),      // same publisher, other subdomain
      (4L, "https://other.org/z"),
      (5L, "not a url at all"),
      (6L, "https://keep.com/q")).toDF("id", "url")
    val out = UrlOps.filterBlockedDomains(df, "url", suffixes, Seq("bad.co.uk"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 6L))
    // unparseable rows survive only when asked
    val kept = UrlOps.filterBlockedDomains(df, "url", suffixes, Seq("bad.co.uk"),
      keepUnparseable = true)
    assert(kept.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 5L, 6L))
    // the pass is map-only: no shuffle anywhere in the filter plan
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "domain filtering must not shuffle")
  }

  test("canonicalUrl: every normalization family, junk to null") {
    val cases = Seq(
      // scheme/host case, www., default port, trailing slash
      "HTTPS://WWW.Example.COM:443/a/b/" -> "https://example.com/a/b",
      "http://www.example.com:80/" -> "http://example.com/",
      // non-default port kept; fragment dropped
      "https://example.com:8443/x#frag" -> "https://example.com:8443/x",
      // tracking params dropped, survivors SORTED, ? dropped when none left
      "https://example.com/p?utm_source=x&b=2&a=1&fbclid=z" ->
        "https://example.com/p?a=1&b=2",
      "https://example.com/p?utm_campaign=only" -> "https://example.com/p",
      // empty path -> /
      "https://example.com" -> "https://example.com/",
      // bare www. host is NOT stripped to empty (single-label host kept)
      "https://www./x" -> "https://www/x",
      // junk / non-http
      "not a url" -> null,
      "ftp://example.com/f" -> null,
      "mailto:x@example.com" -> null)
    val out = cases.map(_._1).toDF("url")
      .select(graft.functions.UrlNativeFunctions.canonicalUrl(col("url")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    cases.map(_._2).zip(out).zip(cases.map(_._1)).foreach { case ((want, got), in) =>
      assert(got == want, s"canonicalUrl($in): got $got want $want")
    }
    // parameter order NEVER distinguishes two URLs
    val a = Seq("https://e.com/p?x=1&y=2").toDF("url")
      .select(graft.functions.UrlNativeFunctions.canonicalUrl(col("url"))).head.getString(0)
    val b = Seq("https://e.com/p?y=2&x=1").toDF("url")
      .select(graft.functions.UrlNativeFunctions.canonicalUrl(col("url"))).head.getString(0)
    assert(a == b)
  }

  test("dedupByCanonicalUrl keeps one survivor per canonical key, drops junk") {
    val df = Seq(
      (1L, "https://www.e.com/a/"),
      (2L, "HTTPS://E.COM:443/a"),
      (3L, "https://e.com/a?utm_source=x"),
      (4L, "https://e.com/b"),
      (5L, "garbage url")).toDF("doc_id", "url")
    val out = UrlOps.dedupByCanonicalUrl(df, "url")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L),
      "smallest doc_id survives per canonical group; junk dropped")
  }

  test("canonicalUrl: `ref` is load-bearing by default, droppable via extraTracking") {
    def canon(u: String, extra: Seq[String] = Seq.empty): String =
      Seq(u).toDF("url")
        .select(UrlNativeFunctions.canonicalUrl(col("url"), extra))
        .head.getString(0)
    // ?ref=<branch> selects a DIFFERENT page — must survive the key
    assert(canon("https://e.com/tree?ref=main") == "https://e.com/tree?ref=main")
    assert(canon("https://e.com/tree?ref=main") != canon("https://e.com/tree?ref=dev"))
    // click IDs still die
    assert(canon("https://e.com/p?gclid=z&ref=r") == "https://e.com/p?ref=r")
    // a pipeline that wants C4-style ref-stripping opts in
    assert(canon("https://e.com/p?ref=r&a=1", extra = Seq("ref")) ==
      "https://e.com/p?a=1")
  }

  test("canonicalUrl codegens (no CodegenFallback): kernel call inside the stage") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val e = graft.functions.CanonicalUrlExpr(
      org.apache.spark.sql.GraftColumnBridge.toExpr(col("url")))
    assert(!e.isInstanceOf[CodegenFallback],
      "CanonicalUrlExpr must participate in whole-stage codegen")
    // the generated stage actually calls the static kernel (spark.range
    // keeps the projection un-foldable so a WholeStageCodegen span exists)
    val df = spark.range(2)
      .select(concat(lit("https://www.e.com/a/"), col("id")).as("url"))
      .select(UrlNativeFunctions.canonicalUrl(col("url")).as("cu"))
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("UrlKernels.canonicalUrl"),
      s"expected a direct kernel call in generated code, got:\n$gen")
    assert(df.orderBy("cu").head.getString(0) == "https://e.com/a/0")
  }

  test("withRegistrableDomain feeds domain-keyed splits (leakage grain)") {
    val df = Seq(
      "https://en.pub.co.uk/a", "https://fr.pub.co.uk/b", "https://x.pub.co.uk/c")
      .toDF("url")
    val d = UrlOps.withRegistrableDomain(df, "url", suffixes)
    // one registrable domain for all three hosts → one split bucket
    val splits = Sampling.splitAssign(d, Sampling.stringKey(col("domain")),
      Seq("train" -> 0.5, "eval" -> 0.5))
      .select("split").distinct().collect()
    assert(splits.length == 1, "same publisher must land in one split")
  }
}
