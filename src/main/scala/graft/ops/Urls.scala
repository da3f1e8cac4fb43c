package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level curation — the web-crawl half
  * of corpus hygiene (C4 / RefinedWeb recipe: canonicalize URLs before
  * URL-level dedup, extract registered domains for blocklists and
  * per-domain caps). dask-glm has no web surface; north-star pipeline
  * scope (SURVEY §2 addendum).
  *
  * Everything here is a PURE COLUMN composition (trim / lower /
  * regexp_replace / regexp_extract chains) — codegen'd, shuffle-free,
  * pushdown-transparent, and replayable in DuckDB (q127/q128 hash-check
  * the full chains; the oracle uses RE2 `\1` backreference syntax and
  * explicit `'g'` flags where Spark's Java-regex `$1` / replace-all
  * defaults differ). Every regex stays inside the Java∩RE2 common
  * subset: no lookarounds, no backreference matching, only
  * non-capturing groups and character classes.
  *
  * 100 TB shape: these are per-row projections; the expensive steps
  * they FEED (URL-level exact dedup via [[Dedup.exact]], per-domain
  * caps via [[Sampling.stratifiedCap]], blocklist anti-joins) keep
  * their own bounded-shuffle contracts.
  */
object Urls {

  /** Tracking query parameters stripped by [[normalizeUrl]] (each entry
    * a Java∩RE2 name pattern): the click-/campaign-identifier families
    * that make otherwise-identical URLs distinct (the canonical URL-dedup
    * false-negative source). Deliberately does NOT include bare `ref` —
    * on many sites (`?ref=<branch>` on code hosts) it selects genuinely
    * distinct content, and stripping it would falsely merge pages; pass
    * a custom list to [[normalizeUrl]] if a corpus wants it stripped. */
  val DefaultTrackedParams: Seq[String] =
    Seq("utm_[^=&]*", "gclid", "fbclid", "msclkid", "yclid")

  private val AbsoluteUrl = "^[A-Za-z][A-Za-z0-9+.-]*://.*"

  /** Canonicalize an absolute http(s)/ftp-style URL:
    *
    *  1. trim surrounding whitespace;
    *  2. drop the `#fragment` (never sent to the server — pure
    *     client-side state, the classic duplicate-URL source);
    *  3. lowercase the scheme and authority (RFC 3986 §6.2.2.1: scheme
    *     and host are case-insensitive; path/query are NOT touched);
    *  4. drop default ports (`http://h:80/` → `http://h/`,
    *     `https://h:443/` → `https://h/`);
    *  5. drop tracking query params ([[TrackedParams]]), wherever they
    *     sit in the query string, keeping the rest in order;
    *  6. drop a now-empty `?`/`&` tail and a bare-host trailing slash
    *     (`https://h/` → `https://h`).
    *
    * A value that is not an absolute URL (no `scheme://`) passes through
    * trimmed and fragment-stripped but otherwise untouched — relative
    * links and garbage stay inspectable instead of being half-mangled.
    * NULL in → NULL out.
    *
    * `trackedParams` is the stripped-parameter set ([[DefaultTrackedParams]]
    * by default) — caller-configurable because "tracking" is
    * site-dependent; entries must stay in the Java∩RE2 regex subset and
    * must not contain capturing groups (they would renumber the `$1`
    * backreferences in the stripping chain). */
  def normalizeUrl(url: Column): Column =
    normalizeUrl(url, DefaultTrackedParams)

  def normalizeUrl(url: Column, trackedParams: Seq[String]): Column = {
    require(trackedParams.nonEmpty,
      "normalizeUrl: empty trackedParams — call with DefaultTrackedParams " +
        "or a non-empty custom set")
    // a CAPTURING group would renumber the $1 backreferences in the
    // stripping regexes below — the one entry shape that silently
    // corrupts output rather than failing. A group captures only when
    // the '(' is a real metacharacter (not escaped as \( — escape-aware
    // scan, so '\\(' after a literal backslash still counts) and is not
    // immediately followed by '?' ((?:...), lookarounds, flags). Named
    // groups (?<name>...) DO capture and renumber $1 — of the '(?'
    // forms, only lookbehinds '(?<=' / '(?<!' are non-capturing, so a
    // '(?<' followed by anything else is rejected too.
    def hasCapture(p: String): Boolean = {
      var i = 0
      while (i < p.length) {
        if (p(i) == '\\') i += 2 // escaped char: '(' here is a literal
        else {
          if (p(i) == '(') {
            if (i + 1 >= p.length || p(i + 1) != '?') return true
            if (i + 2 < p.length && p(i + 2) == '<' &&
              (i + 3 >= p.length || (p(i + 3) != '=' && p(i + 3) != '!')))
              return true // named group (?<name>...) captures
          }
          i += 1
        }
      }
      false
    }
    require(trackedParams.forall(p => p.nonEmpty && !hasCapture(p)),
      "normalizeUrl: trackedParams entries must be non-empty and free of " +
        "capturing groups (use (?:...) if grouping is needed), got " +
        trackedParams.filter(p => p.isEmpty || hasCapture(p))
          .take(3).mkString(", "))
    val tracked = trackedParams.mkString("|")
    val t = regexp_replace(trim(url), "#.*$", "")
    // scheme+authority lowercased, remainder byte-preserved
    val head = lower(regexp_extract(t, "^([^/?#]*://[^/?#]*)", 1))
    val tail = regexp_extract(t, "^[^/?#]*://[^/?#]*(.*)$", 1)
    val lowered = concat(head, tail)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    val noTrack = regexp_replace(
      regexp_replace(noPort, s"([?&])(?:(?:$tracked)=[^&]*&)+", "$1"),
      s"(?:[?&](?:$tracked)=[^&]*)+$$", "")
    val noTail = regexp_replace(
      regexp_replace(noTrack, "[?&]+$", ""),
      "^([a-z][a-z0-9+.-]*://[^/?#]*)/$", "$1")
    when(url.isNull, lit(null).cast("string"))
      .when(t.rlike(AbsoluteUrl), noTail)
      .otherwise(t)
  }

  /** The lowercased host of an absolute URL — authority minus userinfo
    * and port. Empty string for non-URL input (never NULL-for-garbage:
    * a NULL here means the input was NULL). */
  def hostOf(url: Column): Column =
    lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)", 1))

  /** Multi-part public suffixes recognized by [[registeredDomainOf]] —
    * the high-traffic two-label TLD families. A deliberate, documented
    * HEURISTIC subset of the Mozilla Public Suffix List (shipping the
    * full 9k-rule list is a data-file decision, not an algorithm
    * change; the cross-product over-matches rare combinations like
    * `ne.uk`, which fail closed to a 3-label domain — acceptable for
    * blocklists and caps, both of which only need determinism). */
  private val MultiPartSuffix =
    "(?:co|com|net|org|gov|ac|edu|ne|or)\\.(?:uk|jp|au|nz|in|br|mx|cn|sg|tr|za|kr|id)"

  /** The registered (pay-level) domain of a URL: host, minus any
    * `www`-prefix label, cut to the last two labels — or the last three
    * when the last two are a [[MultiPartSuffix]] (`a.b.co.uk` →
    * `b.co.uk`). Single-label hosts (e.g. `localhost`) pass through.
    * Empty string for non-URL input. */
  def registeredDomainOf(url: Column): Column = {
    val h = regexp_replace(hostOf(url), "^www[0-9]*\\.", "")
    val dom3 = regexp_extract(h, s"([^.]+\\.$MultiPartSuffix)$$", 1)
    val dom2 = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(dom3 =!= "", dom3).when(dom2 =!= "", dom2).otherwise(h)
  }

  /** Drop rows whose registered domain is on a blocklist, including
    * subdomains of blocked domains (blocking `spam.com` drops
    * `a.spam.com` too, because matching is on the REGISTERED domain).
    * The in-memory overload builds one codegen'd `isin` — for the
    * hand-curated-list case (tens to thousands of entries). */
  def dropBlockedDomains(df: DataFrame, urlCol: Column,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "dropBlockedDomains: empty blocklist — " +
      "dropping nothing is more likely a bug than an intent; skip the call")
    val normalized = blocked.map(_.trim.toLowerCase)
    require(normalized.forall(b => b.nonEmpty && !b.contains("/")),
      s"dropBlockedDomains: blocklist entries must be bare domains, got " +
        normalized.filter(b => b.isEmpty || b.contains("/")).take(3).mkString(", "))
    df.filter(!registeredDomainOf(urlCol).isin(normalized: _*))
  }

  /** [[dropBlockedDomains]] against a blocklist TABLE (`domain` column)
    * — the curated-feed case where the list is too big or too dynamic
    * for a literal. Broadcast left-anti join on the registered domain:
    * one corpus scan, no corpus shuffle. */
  def dropBlockedDomains(df: DataFrame, urlCol: Column,
      blocklist: DataFrame): DataFrame = {
    val clash = df.columns.filter(Seq("__dom", "__blocked_dom").contains)
    require(clash.isEmpty,
      s"dropBlockedDomains: input already has column(s) ${clash.mkString(", ")}" +
        " — those names are reserved scratch columns here; rename first")
    val b = blocklist.select(lower(trim(col("domain"))).as("__blocked_dom")).distinct()
    df.withColumn("__dom", registeredDomainOf(urlCol))
      .join(broadcast(b), col("__dom") === col("__blocked_dom"), "left_anti")
      .drop("__dom")
  }

  /** URL-level exact deduplication — the canonical crawl first pass
    * (C4 deduplicates by URL before any content pass): canonicalize via
    * [[normalizeUrl]], then keep the min-`idCol` row per canonical URL
    * through [[Dedup.exact]]'s collision-free key. Tracking-param,
    * case, port, and fragment variants of one page collapse to a single
    * row; `n_copies` reports the collapsed multiplicity. One
    * aggregation shuffle on the canonical-URL hash. */
  def dedupByUrl(df: DataFrame, urlCol: Column, idCol: String,
      trackedParams: Seq[String] = DefaultTrackedParams): DataFrame = {
    require(!df.columns.contains("__canon_url"),
      "dedupByUrl: input already has a __canon_url column")
    Dedup.exact(
        df.withColumn("__canon_url", normalizeUrl(urlCol, trackedParams)),
        idCol, Seq("__canon_url"))
      .drop("__canon_url")
  }

  /** Keep at most `k` rows per registered domain, chosen by the
    * deterministic md5 coin over `keyCol` — the anti-domination cap
    * (one seed-farm domain cannot swamp the corpus). Delegates to
    * [[Sampling.stratifiedCap]]'s WindowGroupLimit shape; the (coin,
    * key) order is total, so the pick is rerun- and engine-stable. */
  def perDomainCap(df: DataFrame, urlCol: Column, k: Int,
      keyCol: Column, seed: Long = 42L): DataFrame = {
    require(!df.columns.contains("__domain"),
      "perDomainCap: input already has a __domain column")
    Sampling.stratifiedCap(
        df.withColumn("__domain", registeredDomainOf(urlCol)),
        Seq("__domain"), k,
        Seq(Sampling.hashU32(keyCol, seed).asc, keyCol.asc))
      .drop("__domain")
  }
}
