package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus curation (the CCNet/RefinedWeb-style
  * preprocessing step): host extraction, registered-domain reduction,
  * tracking-parameter-stripping normalization, and domain blocklist
  * filtering. All pure per-row column expressions — no shuffle, no UDF;
  * the blocklist filter is one broadcast anti-join.
  *
  * Registered-domain note: a full public-suffix-list lookup is a
  * ~10k-entry table; this implements the pragmatic core — last two
  * labels, or last three when the two-label tail is a common two-part
  * suffix (co.uk, com.au, ...). Callers needing the full PSL can join
  * a suffix table instead; the column shape is the same.
  */
object UrlOps {

  private val SchemePrefix = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  /** Lowercased host: authority minus userinfo and port. Empty string for
    * strings without a scheme://authority shape.
    */
  def host(url: Column): Column =
    lower(regexp_extract(url, SchemePrefix + "(?:[^/?#@]*@)?([^/?#:@]+)", 1))

  /** Common two-part suffixes where the registrable name is three labels
    * deep; the pragmatic subset of the public-suffix list.
    */
  val TwoPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "co.jp", "ne.jp", "or.jp",
    "co.in", "co.kr", "com.au", "net.au", "org.au", "com.br", "com.cn",
    "com.mx", "com.tr", "com.sg", "co.za")

  /** Registered (pay-level) domain of a lowercased host: last two labels,
    * or last three when the tail is a [[TwoPartSuffixes]] entry; hosts
    * with fewer than three labels pass through.
    */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val last3 = concat_ws(".", slice(labels, -3, 3))
    when(n <= 2, hostCol)
      .when(last2.isin(TwoPartSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Query parameters dropped by [[normalize]] — the common click/campaign
    * trackers whose presence makes byte-identical pages hash differently.
    */
  private val TrackingParamRe = "^(utm_[^=]*|gclid|fbclid|msclkid)(=.*)?$"

  /** Canonical URL: scheme and authority lowercased, fragment dropped,
    * tracking parameters removed ([[TrackingParamRe]]), an emptied query
    * string dropped entirely. Path and surviving parameters keep their
    * original order and case — reordering them changes semantics on some
    * servers. The array `filter` is a CodegenFallback higher-order
    * function (interpreted, not codegen'd) — fine off the hot path; a
    * corpus-wide canonicalization pass is IO-bound on text anyway.
    */
  def normalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(url, SchemePrefix + "([^/?#]*)", 1))
    val path = regexp_extract(url, SchemePrefix + "[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike(TrackingParamRe))
    val qs = when(size(kept) > 0, concat(lit("?"), concat_ws("&", kept)))
      .otherwise(lit(""))
    when(scheme === "", url)                 // not a URL: pass through
      .otherwise(concat(scheme, lit("://"), auth, path, qs))
  }

  /** Adds `host`, `registered_domain`, `url_norm` derived from `urlCol`. */
  def withUrlColumns(df: DataFrame, urlCol: String): DataFrame = {
    val h = host(col(urlCol))
    df.withColumn("host", h)
      .withColumn("registered_domain", registeredDomain(h))
      .withColumn("url_norm", normalize(col(urlCol)))
  }

  /** Drops rows whose registered domain appears in `blocklist` (a one-
    * column DataFrame of domains). Broadcast anti-join: the blocklist is
    * dimension-sized (thousands of domains), the corpus never shuffles.
    */
  def filterBlocked(df: DataFrame, urlCol: String, blocklist: DataFrame): DataFrame = {
    val bad = blocklist.toDF("__blocked_domain")
    df.withColumn("__rd", registeredDomain(host(col(urlCol))))
      .join(broadcast(bad), col("__rd") === col("__blocked_domain"), "left_anti")
      .drop("__rd")
  }
}
