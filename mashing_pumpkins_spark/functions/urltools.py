"""URL canonicalization — pure JVM Column expressions.

A Common-Crawl-scale pipeline dedups and aggregates by URL before it ever
touches content: the same page is crawled under scheme/host case variants,
default ports, trailing slashes, tracking query parameters, and fragments.
`canonicalize_url` folds those variants to one canonical form so exact-URL
dedup and per-host statistics shuffle on a stable key; `host_of` extracts
the registrable host for host-level aggregation (crawl budgets, per-site
quality priors, robots bookkeeping).

Everything here is regexp/array Column algebra — no UDF, fully
whole-stage-codegen'd, and replayable in ANSI SQL (the `url_host_stats`
driver query value-checks the normalization per row against an oracle
that derives the canonical form independently from the construction
parameters rather than by re-running these expressions).

Canonical form (conservative, lossless for same-resource variants):
  - scheme and authority lowercased
  - fragment dropped
  - default ports stripped (:80 for http, :443 for https)
  - trailing slashes on the path removed ('/a/b/' == '/a/b'; a bare root
    '/' folds into the authority)
  - tracking query parameters removed (utm_*, fbclid, gclid, ref),
    remaining parameters sorted for order-insensitivity, '?' dropped if
    nothing survives
Inputs without a scheme are returned trimmed but otherwise untouched
(relative references are not URLs to canonicalize).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def _authority(rest: Column) -> Column:
    # stop at '#' too: host_of receives un-defragmented input, and a
    # fragment directly after the authority ('http://a.com#top') must not
    # leak into the host (round-4 review fix)
    return F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute URL (see module docstring)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(
        F.regexp_replace(u, _SCHEME_RE, ""), r"#.*$", ""  # strip fragment
    )
    auth = _authority(rest)
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    pathq = F.regexp_extract(rest, r"^[^/?]*([/?].*)?$", 1)
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_RE),
        )
    )
    qstr = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)


def host_of(url: Column) -> Column:
    """Lowercased host of an absolute URL, any port stripped; empty string
    for scheme-less inputs."""
    u = F.trim(url)
    scheme = F.regexp_extract(u, _SCHEME_RE, 1)
    auth = _authority(F.regexp_replace(u, _SCHEME_RE, ""))
    return F.when(
        scheme == "", F.lit("")
    ).otherwise(F.regexp_replace(auth, r":[0-9]+$", ""))


def _path_query(url: Column) -> Column:
    """Lowercased path+query of a URL: everything from the first '/' OR
    '?' after the authority (a path-less 'http://h?x=1' still has a
    query), fragment stripped; empty for bare-authority urls."""
    rest = F.substring_index(
        F.lower(F.regexp_replace(url, _SCHEME_RE, "")), "#", 1
    )
    slash = F.instr(rest, "/")
    qmark = F.instr(rest, "?")
    start = (
        F.when((slash > 0) & ((qmark == 0) | (slash < qmark)), slash)
        .when(qmark > 0, qmark)
        .otherwise(F.lit(0))
    )
    return F.when(start > 0, rest.substr(start, F.length(rest))).otherwise(
        F.lit("")
    )


def url_filter_flags(
    url: Column,
    blocked_hosts: list[str],
    blocked_path_terms: list[str],
) -> Column:
    """Struct(host_blocked, path_blocked, blocked) — UT1/adult-blocklist
    style URL filtering, the standard pre-fetch cut in a crawl curation
    pipeline. `blocked_hosts` matches the registrable host exactly OR as
    a suffix at a dot boundary (blocking 'example.com' also blocks
    'ads.example.com' but NOT 'notexample.com'); `blocked_path_terms`
    are literal lowercase substrings of the path+query.

    Pure Column algebra: list literals compile into the plan (the real
    UT1 lists are a few MB — at that size swap the `exists` over a
    literal array for a broadcast semi-join on host, same semantics),
    so the filter runs at scan speed with zero Python and replays in
    ANSI SQL."""
    host = host_of(url)
    h = F.lower(host)
    hosts_arr = F.array(*[F.lit(x.lower()) for x in blocked_hosts])
    host_blocked = F.exists(
        hosts_arr, lambda b: (h == b) | h.endswith(F.concat(F.lit("."), b))
    )
    path = _path_query(url)
    terms_arr = F.array(*[F.lit(t.lower()) for t in blocked_path_terms])
    path_blocked = F.exists(terms_arr, lambda t: F.instr(path, t) > 0)
    return F.struct(
        host_blocked.alias("host_blocked"),
        path_blocked.alias("path_blocked"),
        (host_blocked | path_blocked).alias("blocked"),
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key, the canonical
    sort/partition key of Common Crawl's CDX index: host components
    reversed and comma-joined, then ')' and the lowercased path+query
    ('http://news.example.com/a/b?x=1' -> 'com,example,news)/a/b?x=1').
    Same-site urls become lexicographic neighbors, so a range scan over
    the index covers a site — the property the CDX files sort by. Pure
    Column algebra (split/reverse/join on host_of + the url_filter path
    logic)."""
    host = host_of(url)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = _path_query(url)
    return F.concat(rev, F.lit(")"), path)
