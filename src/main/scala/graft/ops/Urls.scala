package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-derived corpora: the dedup key for web
  * documents is almost never the raw URL — scheme, `www.`, query tracking
  * params, fragments and trailing slashes all vary across recrawls of the
  * same page. Everything here is a row-local chain of codegen'd builtin
  * regexps (shuffle-free; the shapes are kept deliberately simple so the
  * exact same patterns run on any ANSI-regex engine for cross-checking).
  */
object Urls {

  /** Canonical form: lowercase, scheme / `www.` / query / fragment /
    * trailing slashes stripped. Idempotent. */
  def normalizeUrl(url: Column): Column = {
    val noScheme = regexp_replace(lower(url), "^[a-z][a-z0-9+.-]*://", "")
    val noFrag = regexp_replace(noScheme, "#.*$", "")
    val noQuery = regexp_replace(noFrag, "\\?.*$", "")
    val noWww = regexp_replace(noQuery, "^www\\.", "")
    regexp_replace(noWww, "/+$", "")
  }

  /** Host part of a normalized URL (everything before the first `/` or
    * `:`). Apply to [[normalizeUrl]] output. */
  def host(normUrl: Column): Column =
    regexp_replace(normUrl, "[/:].*$", "")

  /** Registrable-domain heuristic: the last two dot-separated labels of the
    * host (`a.b.example.com` → `example.com`). A public-suffix-list lookup
    * would broadcast-join a suffix table; the 2-label heuristic is the
    * standard no-dependency approximation. */
  def registrableDomain(hostCol: Column): Column =
    regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
}
