package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UrlNativeFunctions

/** URL/domain curation operators over the registrable-domain
  * (eTLD+1) extraction in [[graft.functions.UrlNativeFunctions]]:
  * blocklist filtering and domain-keyed attribution — the step every
  * crawl-derived corpus runs before dedup/quality (drop link farms and
  * known-contaminated publishers, attribute documents to the
  * registrable domain for caps and leakage-safe splits).
  *
  * Everything here is MAP-ONLY: the suffix set broadcasts once, the
  * blocklist folds into a hash-set probe on the same pass — no join,
  * no shuffle, so a 100 TB pass stays scan-bound. Compose with the
  * existing primitives: `Sampling.splitAssign(df,
  * Sampling.stringKey(col("domain")), …)` for domain-keyed splits,
  * `TopKPerKey` for per-domain caps.
  */
object UrlOps {

  /** `df` plus `domainCol` = the registrable domain of `urlCol` (null
    * when the URL has no parseable host or the host is a bare suffix).
    */
  def withRegistrableDomain(df: DataFrame, urlCol: String,
      suffixes: Seq[String], domainCol: String = "domain"): DataFrame =
    df.withColumn(domainCol,
      UrlNativeFunctions.urlRegistrableDomain(col(urlCol), suffixes))

  /** Drop rows whose REGISTRABLE domain is blocked. Blocking at the
    * registrable grain is the point: blocking "example.co.uk" kills
    * en.example.co.uk and cdn.example.co.uk in one rule, while a raw
    * hostname blocklist misses every subdomain. Rows without a
    * registrable domain (unparseable URL, bare-suffix host) are dropped
    * unless `keepUnparseable` — curation pipelines usually treat
    * no-provenance documents as unkeepable.
    */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
      suffixes: Seq[String], blocked: Seq[String],
      keepUnparseable: Boolean = false): DataFrame = {
    val blockedNorm = blocked.map(_.toLowerCase(java.util.Locale.ROOT))
    val d = UrlNativeFunctions.urlRegistrableDomain(col(urlCol), suffixes)
    val pass =
      if (blockedNorm.isEmpty) d.isNotNull
      else d.isNotNull && !d.isin(blockedNorm: _*)
    df.filter(if (keepUnparseable) d.isNull || pass else pass)
  }

  /** `df` plus `canonicalCol` = the canonical dedup key of `urlCol`
    * (CanonicalUrlExpr's normalization; null for junk / non-http).
    * Map-only.
    */
  def withCanonicalUrl(df: DataFrame, urlCol: String,
      canonicalCol: String = "canonical_url"): DataFrame =
    df.withColumn(canonicalCol, UrlNativeFunctions.canonicalUrl(col(urlCol)))

  /** URL-level exact dedup: one survivor (smallest `idCol`) per
    * canonical URL; rows whose URL has no canonical form are DROPPED
    * (same unkeepable-provenance stance as the blocklist filter). One
    * group-by shuffle on the canonical key — the C4-style "dedup by
    * URL" pass.
    */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val keyed = withCanonicalUrl(df, urlCol, "__cu")
      .filter(col("__cu").isNotNull)
    val winners = keyed.groupBy(col("__cu"))
      .agg(min(col(idCol)).as(idCol))
    keyed.join(winners, Seq("__cu", idCol)).drop("__cu")
  }
}
