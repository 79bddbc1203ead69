"""Canonical-URL normalization + dedup - the crawl-frontier primitive of
every web pipeline (the reference operates on already-resolved URIs; at
10^12-page scale duplicate-URL collapse happens before any fetch/convert).

All pure JVM column expressions with exact DuckDB equivalents (regexes are
dialect-neutral), so the operator is oracle-checkable like the text suite:

* scheme + host lowercase (RFC 3986 case-insensitive components; userinfo
  is user data - kept verbatim, and split off the authority BEFORE port
  handling so 'user:80@host' can never confuse default-port stripping);
* default ports dropped (:80 for http, :443 for https);
* fragment dropped (never sent to the server);
* tracking query params dropped (utm_*, fbclid, gclid, msclkid) - with or
  without a value: a bare 'fbclid' is as much tracker residue as
  'fbclid=x';
* remaining query params SORTED (order-insensitive equivalence);
* empty path -> '/'.

This is a narrow shuffle-free projection; the dedup groupBy keys on the
canonical string (uniform, skew-free like any digest key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring).
    Non-URL strings pass through lowercased-scheme-less unchanged."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth = F.regexp_extract(url, r"^[^:]+://([^/?#]+)", 1)
    # userinfo (up to the last '@') is case-sensitive user data: split it
    # off, lowercase + default-port-strip only the host[:port] remainder
    userinfo = F.regexp_extract(auth, r"^(.*)@", 1)
    hostport = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    hostport = F.when(scheme == "http",
                      F.regexp_replace(hostport, ":80$", "")) \
                .when(scheme == "https",
                      F.regexp_replace(hostport, ":443$", "")) \
                .otherwise(hostport)
    host = F.when(userinfo != "",
                  F.concat(userinfo, F.lit("@"), hostport)) \
            .otherwise(hostport)
    path = F.regexp_extract(url, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qs = F.concat_ws("&", params)
    canon = F.concat(scheme, F.lit("://"), host, path,
                     F.when(qs != "", F.concat(F.lit("?"), qs))
                      .otherwise(F.lit("")))
    return F.when(scheme == "", url).otherwise(canon)


def host_of(url: Column) -> Column:
    """Lowercased host[:port] of an absolute URL - the crawl-curation
    grouping key: userinfo stripped, DEFAULT ports stripped (mirroring
    canonicalize_url, so 'http://h/a' and 'http://h:80/b' group as one
    host and per-host caps cannot be dodged with port variants); '' for
    non-URLs."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth = F.regexp_extract(url, r"^[^:]+://([^/?#]+)", 1)
    hostport = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    return F.when(scheme == "http",
                  F.regexp_replace(hostport, ":80$", "")) \
            .when(scheme == "https",
                  F.regexp_replace(hostport, ":443$", "")) \
            .otherwise(hostport)


def host_profile(df: DataFrame, url_col: str = "url",
                 key_col: str = "doc_id") -> DataFrame:
    """Per-host crawl statistics: (host, n_pages, n_distinct_canonical,
    first_key). One uniform groupBy on the host string - the input to
    domain-level curation decisions (blocklists, per-domain caps, spam
    domains dominating the crawl)."""
    return (df.select(
                host_of(F.col(url_col)).alias("host"),
                canonicalize_url(F.col(url_col)).alias("_c"),
                F.col(key_col))
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.countDistinct("_c").alias("n_distinct_canonical"),
                 F.min(key_col).alias("first_key")))


def cap_per_host(df: DataFrame, k: int, url_col: str = "url",
                 key_col: str = "doc_id", seed: int = 42,
                 prefilter_bp=None) -> DataFrame:
    """At most k pages per host, chosen uniformly and DETERMINISTICALLY
    (hash-rank per host) - the per-domain cap of C4/RefinedWeb-style
    curation, where a handful of mega-hosts would otherwise dominate the
    corpus. Delegates to sampling.stratified_sample_topk on the host
    stratum (see its prefilter_bp note for the mega-corpus shape)."""
    from .sampling import stratified_sample_topk
    with_host = df.withColumn("_host", host_of(F.col(url_col)))
    return (stratified_sample_topk(with_host, k, stratum_col="_host",
                                   key_col=key_col, seed=seed,
                                   prefilter_bp=prefilter_bp)
            .drop("_host"))


def dedup_urls(df: DataFrame, url_col: str = "url",
               key_col: str = "doc_id") -> DataFrame:
    """Collapse URL variants: (canonical_url, keeper = min key, n_variants,
    n_distinct_raw). One shuffle on the canonical string."""
    return (df
            .select(canonicalize_url(F.col(url_col)).alias("canonical_url"),
                    F.col(url_col).alias("_raw"), F.col(key_col))
            .groupBy("canonical_url")
            .agg(F.min(key_col).alias("keeper"),
                 F.count(F.lit(1)).alias("n_variants"),
                 F.countDistinct("_raw").alias("n_distinct_raw")))
