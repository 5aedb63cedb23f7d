package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus URL analysis: extraction, host parsing, and approximate
  * registered-domain (eTLD+1) grouping — the per-domain corpus accounting a
  * crawl-curation pipeline runs (domain mix, boilerplate-source caps).
  *
  * All pure per-row regex/string kernels (codegen, zero shuffle until the
  * final domain rollup). The URL/host regexes live in the Java-regex ∩ RE2
  * subset so the DuckDB oracle replays them verbatim; registered-domain
  * uses an explicit (documented, small) multi-part-suffix list instead of
  * the full public-suffix list — the operator takes the list as a
  * parameter, production swaps in the real PSL.
  */
object WebText {

  /** Scheme-anchored URL matcher (common subset; no lookarounds). */
  val urlPattern = "https?://[^\\s<>\"']+"

  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** Host of a URL: authority up to the first `/ ? # :` — ports and
    * userinfo-free (crawl URLs), lowercased.
    */
  val hostPattern = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)"
  def hostOf(url: Column): Column =
    graft.functions.FastLower(regexp_extract(url, hostPattern, 1))

  /** Default multi-part public suffixes (a deliberately small, documented
    * subset — the parameter exists so the real PSL can be swapped in).
    */
  val defaultMultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in")

  /** Approximate eTLD+1: last two labels, or last three when the last two
    * form a listed multi-part suffix; hosts with fewer labels pass through.
    */
  def registeredDomain(host: Column,
      multiPartSuffixes: Seq[String] = defaultMultiPartSuffixes): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), last2)
    when(n <= 2, host)
      .otherwise(when(last2.isin(multiPartSuffixes: _*), last3).otherwise(last2))
  }
}
