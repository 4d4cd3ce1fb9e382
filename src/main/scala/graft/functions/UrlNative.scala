package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable-domain (eTLD+1) extraction under a caller-provided
  * public-suffix set — the URL/domain layer of corpus curation: crawl
  * source attribution, per-domain caps and blocklists, and
  * leakage-safe splits keyed by the REGISTRABLE domain rather than the
  * raw hostname (en.example.co.uk and fr.example.co.uk are the same
  * publisher; a hostname-keyed split would leak their near-duplicate
  * pages across train/eval).
  *
  * Algorithm: the public-suffix list's matching rule
  * (publicsuffix.org/list) — the LONGEST suffix present in the rule
  * set wins, the registrable domain is that suffix plus one more
  * label; a host with no matching rule falls to the implicit `*` rule
  * (its last label is the suffix). A host that IS a bare suffix, a
  * single label, or empty has no registrable domain → null.
  *
  * Scale shape: the suffix set (~9k entries in the real PSL) is
  * broadcast ONCE and probed as a hash set per candidate suffix —
  * O(#labels) lookups per row, map-only, no join, so the pass over a
  * 100 TB url column is scan-bound. Matching is on the lowercased
  * host; ports and trailing dots are stripped.
  */
case class RegistrableDomainExpr(child: Expression,
    suffixes: org.apache.spark.broadcast.Broadcast[Set[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    var host = input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
    val colon = host.indexOf(':')
    if (colon >= 0) host = host.substring(0, colon)
    host = host.stripSuffix(".")
    if (host.isEmpty || host.startsWith(".") || host.contains("..")) return null
    val labels = host.split('.')
    val n = labels.length
    if (n < 2) return null
    val set = suffixes.value
    // the PREVAILING rule is the longest match, the whole host included:
    // a host that IS a suffix (github.io) has no registrable domain
    if (set.contains(host)) return null
    // longest-match first below the whole host: k labels, n-1 down to 1
    var k = n - 1
    while (k >= 1) {
      if (set.contains(labels.takeRight(k).mkString("."))) {
        return UTF8String.fromString(labels.takeRight(k + 1).mkString("."))
      }
      k -= 1
    }
    UTF8String.fromString(labels.takeRight(2).mkString(".")) // implicit * rule
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "registrable_domain"
}

/** Static URL-normalization kernel — one method call per row so the
  * expression codegens into the surrounding WholeStageCodegen span
  * (same shape as MediaKernels/Kernels).
  */
object UrlKernels {
  /** Canonical form of `input` under `tracking` (lowercase query-param
    * names to drop); null for junk / non-http(s) URLs. See
    * [[CanonicalUrlExpr]] for the normalization contract.
    */
  def canonicalUrl(input: UTF8String, tracking: java.util.Set[String]): UTF8String = {
    val raw = input.toString
    val uri =
      try new java.net.URI(raw.trim)
      catch { case _: java.net.URISyntaxException => return null }
    val scheme = Option(uri.getScheme).map(_.toLowerCase(java.util.Locale.ROOT)).orNull
    if (scheme != "http" && scheme != "https") return null
    var host = Option(uri.getHost).map(_.toLowerCase(java.util.Locale.ROOT)).orNull
    if (host == null || host.isEmpty) return null
    host = host.stripSuffix(".")
    if (host.startsWith("www.") && host.length > 4) host = host.substring(4)
    val defaultPort = if (scheme == "http") 80 else 443
    val port = if (uri.getPort == -1 || uri.getPort == defaultPort) "" else s":${uri.getPort}"
    var path = Option(uri.getRawPath).getOrElse("")
    if (path.isEmpty) path = "/"
    else if (path.length > 1 && path.endsWith("/")) path = path.dropRight(1)
    val query = Option(uri.getRawQuery).map { q =>
      val kept = q.split('&').filter { p =>
        val name = p.takeWhile(_ != '=').toLowerCase(java.util.Locale.ROOT)
        p.nonEmpty && !name.startsWith("utm_") && !tracking.contains(name)
      }.sorted
      if (kept.isEmpty) "" else "?" + kept.mkString("&")
    }.getOrElse("")
    UTF8String.fromString(s"$scheme://$host$port$path$query")
  }
}

/** URL canonicalization — the dedup key every crawl pipeline derives
  * before URL-level dedup (C4 deduplicated by URL; CCNet/RefinedWeb
  * normalize first): the same page arrives as `HTTPS://WWW.Ex.COM:443/a/`
  * and `https://ex.com/a?utm_source=x`, and a raw-string key misses the
  * duplicate. Normalization applied (documented here because it IS the
  * equality contract):
  *  1. scheme/host lowercased; only http/https with a host qualify
  *     (anything else → null: no-provenance rows are unkeepable). The
  *     scheme SURVIVES in the key — http:// and https:// variants of a
  *     page stay distinct origins; pass both through a regexp_replace
  *     first if a pipeline wants them folded;
  *  2. ONE leading `www.` label and a trailing host dot stripped;
  *  3. the scheme's default port (80/443) dropped, others kept;
  *  4. the fragment dropped;
  *  5. query params split on `&`: empties and tracking params dropped
  *     (`utm_*` plus the click-ID set fbclid, gclid, msclkid, mc_eid,
  *     igshid by default — NOT bare `ref`, which is frequently
  *     load-bearing, e.g. `?ref=<branch>` selectors; extend via
  *     `extraTracking`), the rest sorted bytewise and rejoined (`?`
  *     dropped when none survive) — parameter ORDER never
  *     distinguishes two URLs;
  *  6. empty path → `/`; a trailing slash stripped except at the root.
  * Map-only, no shuffle; the dedup itself is the usual group-by-key.
  * Codegen'd: one static kernel call, the tracking set a reference
  * object — no interpreted fallback inside the scan stage.
  */
case class CanonicalUrlExpr(child: Expression,
    extraTracking: Seq[String] = Seq.empty) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val tracking: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    CanonicalUrlExpr.DefaultTracking.foreach(s.add)
    extraTracking.foreach(t => s.add(t.toLowerCase(java.util.Locale.ROOT)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    UrlKernels.canonicalUrl(input.asInstanceOf[UTF8String], tracking)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val setRef = ctx.addReferenceObj("tracking", tracking, "java.util.Set<String>")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlKernels.canonicalUrl($c, $setRef);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "canonical_url"
}

object CanonicalUrlExpr {
  /** Click-ID params that never distinguish pages. Bare `ref`/`ref_src`
    * are deliberately absent (load-bearing on many sites). */
  val DefaultTracking: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_eid", "igshid")
}

object UrlNativeFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  /** Registrable domain of a HOSTNAME column under `suffixes` (a
    * public-suffix-style rule list). The set is broadcast through the
    * active session once per call site.
    */
  def registrableDomain(host: Column, suffixes: Seq[String]): Column = {
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext
      .broadcast(suffixes.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
    toCol(RegistrableDomainExpr(toExpr(host), bc))
  }

  /** Registrable domain of a full URL column: host extracted by Spark's
    * native try_parse_url (null on junk rather than an ANSI error — a
    * crawl column always contains junk), then the suffix walk.
    */
  def urlRegistrableDomain(url: Column, suffixes: Seq[String]): Column =
    registrableDomain(
      org.apache.spark.sql.functions.try_parse_url(url,
        org.apache.spark.sql.functions.lit("HOST")), suffixes)

  /** Canonical dedup key of a URL column (see [[CanonicalUrlExpr]]);
    * null for junk and non-http(s) URLs. `extraTracking` extends the
    * default click-ID drop set (names lowercased). */
  def canonicalUrl(url: Column, extraTracking: Seq[String] = Seq.empty): Column =
    toCol(CanonicalUrlExpr(toExpr(url), extraTracking))
}
