package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing / canonicalization — the web-corpus provenance
  * primitives: split a URL into scheme/host/path, derive the
  * registered domain for per-site rollups (crawl politeness budgets,
  * per-domain quality gates — X57's grouping key), and canonicalize
  * for URL-level dedup (lowercase host, default ports and fragments
  * dropped, query string dropped, trailing slash trimmed).
  *
  * All regexes live in the Java↔RE2 common subset (single capture
  * groups, no lookaround) and both engines return '' on no-match, so a
  * DuckDB oracle replays every extraction identically. Everything here
  * is a map-side codegen'd expression — no shuffle, pushes through any
  * plan. Registered-domain is the pragmatic last-two-labels rule; a
  * public-suffix-list lookup slots in behind the same column contract
  * when multi-label TLD fidelity matters. */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Host, lowercased, with userinfo and ANY port dropped — "host"
    * means the hostname, so a non-default port can never leak into
    * [[registeredDomain]] keys or per-domain rollups
    * ('http://a.example.com:8080/x' rolls up under example.com, not
    * 'example.com:8080'). [[canonicalize]] keeps non-default ports via
    * [[hostPort]] so distinct origins stay distinct under URL dedup. */
  def host(url: Column): Column =
    regexp_replace(hostPort(url), ":[0-9]+$", "")

  /** Host with a NON-DEFAULT port retained (userinfo dropped, default
    * :80/:443 collapsed) — the origin-preserving form for canonical
    * URLs. */
  def hostPort(url: Column): Column = {
    val raw = lower(regexp_extract(url, HostRe, 1))
    val noUser = regexp_replace(raw, "^[^@]*@", "")
    regexp_replace(noUser, ":(80|443)$", "")
  }

  def path(url: Column): Column = regexp_extract(url, PathRe, 1)

  /** Last-two-labels registered domain ("www.a.example.com" →
    * "example.com"); '' when the host has fewer than two labels. */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** Canonical form for URL dedup: scheme://host[:port]/path with the
    * query, fragment, DEFAULT port, and trailing slash dropped (path '/'
    * and '' collapse to the same canonical; a non-default port survives
    * — it names a different origin). */
  def canonicalize(url: Column): Column = {
    val p = regexp_replace(path(url), "/+$", "")
    concat(scheme(url), lit("://"), hostPort(url), p)
  }
}
