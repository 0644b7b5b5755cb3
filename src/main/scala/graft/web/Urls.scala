package graft.web

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction — the normalization every
  * web-crawl pipeline runs before URL-level dedup ("same page, different
  * spelling"), and the registered-domain rollup that drives domain-level
  * quality curation. Pure codegen column chains (regexp_extract /
  * regexp_replace / lower / when) — no UDF, scan-side at any corpus size.
  *
  * REGEX PORTABILITY CONTRACT: Spark compiles Java regex, DuckDB compiles
  * RE2. Every pattern here stays inside their common subset — character
  * classes, anchors, alternation, greedy quantifiers, capture groups; NO
  * lookaround, NO backreferences. Multi-step rewrites (the utm_* strip)
  * are decomposed into sequential global passes whose matches can never
  * overlap a prior pass's replacement, so the two engines' replace-scan
  * semantics agree byte-for-byte.
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  /** path + query, fragment excluded */
  private val RestRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

  /** Lowercased scheme ("" when the value is not a scheme://-shaped URL). */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host with any explicit port stripped. */
  def host(url: Column): Column =
    lower(regexp_replace(regexp_extract(url, HostPortRe, 1), ":[0-9]+$", ""))

  /** Registered domain: the last two dot-labels of [[host]] (example.com
    * from www.example.com). A single-label host (localhost, intranet
    * names) is returned as-is. Public-suffix lists (co.uk) are a data
    * dependency, not an algorithm — a production run joins a broadcast
    * suffix table instead; the two-label rule is the standard
    * crawl-pipeline default. */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    when(h.rlike("\\."), regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
      .otherwise(h)
  }

  /** Canonical form:
    *   - scheme + host lowercased; path/query case preserved
    *   - default ports stripped (http:80, https:443); others kept
    *   - fragment dropped
    *   - utm_* tracking params dropped (three non-overlapping passes:
    *     mid-query `&utm_…`, leading `?utm_…&`, lone `?utm_…`)
    *   - trailing slash stripped from non-root paths; empty path → "/"
    * Non-URL-shaped input (no scheme://) is returned unchanged — callers
    * filter on [[scheme]] =!= "" when they need strictness. */
  def normalize(url: Column): Column = {
    val sch = scheme(url)
    val hostport = regexp_extract(url, HostPortRe, 1)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !((sch === "http" && port === "80") ||
        (sch === "https" && port === "443"))
    val h = concat(host(url), when(keepPort, concat(lit(":"), port))
      .otherwise(lit("")))
    val rest0 = regexp_extract(url, RestRe, 1)
    // utm strip: each pass's pattern cannot match inside a prior pass's
    // replacement text, so global-replace scan order is engine-agnostic
    val r1 = regexp_replace(rest0, "&utm_[A-Za-z0-9_]*=[^&]*", "")
    val r2 = regexp_replace(r1, "\\?utm_[A-Za-z0-9_]*=[^&]*&", "?")
    val r3 = regexp_replace(r2, "\\?utm_[A-Za-z0-9_]*=[^&]*$", "")
    // a non-empty query always survives the slash strip, so an empty
    // result means the path was slashes-only (or absent) → root "/"
    val stripped = regexp_replace(r3, "/+(\\?|$)", "$1")
    val rest = when(stripped === "", lit("/")).otherwise(stripped)
    when(sch === "", url).otherwise(concat(sch, lit("://"), h, rest))
  }
}
