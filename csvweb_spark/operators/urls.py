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


# ---------------------------------------------------------------------------
# Public-suffix / registrable-domain extraction (eTLD+1)
# ---------------------------------------------------------------------------

#: A deterministic test/default subset of the Mozilla Public Suffix List
#: (publicsuffix.org, MPL-2.0 data; the full list is ~9k rules - pass its
#: text to `parse_psl` in production). Includes the PSL's canonical
#: wildcard/exception pair (*.ck / !www.ck).
DEFAULT_PSL_RULES = [
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "de", "fr",
    "jp", "uk", "au", "nz", "br",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "net.br",
    "github.io", "gitlab.io",      # private-domain section entries
    "*.ck", "!www.ck",
]


def parse_psl(text: str) -> list[str]:
    """publicsuffix.org list text -> rule list for registrable_domain:
    comments (//...) and blank lines dropped, rules kept verbatim
    (including '*.' wildcards and '!' exceptions); the ICANN/PRIVATE
    section markers are comments, so both sections are kept - PSL
    semantics treat them identically."""
    rules = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rules.append(line.split()[0])
    return rules


def registrable_domain(df: DataFrame, host_col: str = "host",
                       rules: list[str] | None = None,
                       max_suffix_labels: int = 5) -> DataFrame:
    """Adds (public_suffix, registrable_domain) columns: the PSL
    algorithm (publicsuffix.org/list/) - prevailing rule is any
    matching exception (public suffix = rule minus leftmost label),
    else the match with most labels (wildcard '*.x' matches one extra
    label), else the implicit '*' rule (last label). registrable_domain
    (eTLD+1) is the suffix plus one label, NULL when the host IS a
    public suffix.

    Scale shape: ZERO shuffle. PSL rules have bounded depth, so instead
    of explode + groupBy(host) the host's candidate label-suffixes join
    the (tiny, broadcast) rule table once per candidate depth - a fixed
    chain of `max_suffix_labels` BROADCAST left joins over the scan,
    then one CASE projection. At 10^12 rows the plan is
    scan -> 5x BroadcastHashJoin -> project."""
    if max_suffix_labels < 2:
        raise ValueError("max_suffix_labels must be >= 2 (PSL rules are "
                         "multi-label; 5 covers the published list)")
    spark = df.sparkSession
    rule_rows = []
    for r in (DEFAULT_PSL_RULES if rules is None else rules):
        if r.startswith("!"):
            rule_rows.append((r[1:], "exception"))
        elif r.startswith("*."):
            rule_rows.append((r[2:], "wildcard"))
        else:
            rule_rows.append((r, "exact"))
    rules_df = spark.createDataFrame(rule_rows, "rule string, kind string")

    labels = F.split(F.lower(F.col(host_col)), r"\.")
    n = F.size(labels)
    out = df.withColumn("_labels", labels)
    hit_cols = []
    for i in range(1, max_suffix_labels + 1):
        cand = F.when(n >= i, F.array_join(
            F.slice(F.col("_labels"), -i, i), "."))
        ri = rules_df.select(F.col("rule").alias(f"_r{i}"),
                             F.col("kind").alias(f"_k{i}"))
        out = (out.withColumn(f"_c{i}", cand)
               .join(F.broadcast(ri), F.col(f"_c{i}") == F.col(f"_r{i}"),
                     "left"))
        hit_cols.append(i)
    # prevailing exception (PSL: exception beats everything)
    exc_len = F.greatest(*[
        F.when(F.col(f"_k{i}") == "exception", F.lit(i))
        for i in hit_cols])
    best = F.greatest(*(
        [F.when(F.col(f"_k{i}") == "exact", F.lit(i)) for i in hit_cols]
        + [F.when(F.col(f"_k{i}") == "wildcard", F.lit(i + 1))
           for i in hit_cols]
        + [F.lit(1)]))
    pub_len = F.when(exc_len.isNotNull(), exc_len - 1).otherwise(best)
    suffix = F.when(n >= pub_len, F.array_join(
        F.slice(F.col("_labels"), -pub_len, pub_len), "."))
    reg = F.when(n > pub_len, F.array_join(
        F.slice(F.col("_labels"),
                (-pub_len - 1).cast("int"), pub_len + 1), "."))
    drop = (["_labels"] + [f"_c{i}" for i in hit_cols]
            + [f"_r{i}" for i in hit_cols] + [f"_k{i}" for i in hit_cols])
    return (out.withColumn("public_suffix", suffix)
            .withColumn("registrable_domain", reg)
            .drop(*drop))
