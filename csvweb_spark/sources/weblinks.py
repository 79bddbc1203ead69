"""Hyperlink-graph extraction from HTML pages - the web-KG edge source.

The reference converts one table at a time and never looks at links
(csvweb has no crawl component); at 10^12-page scale the link graph IS
the backbone of KG construction: host-level PageRank feeds curation
(host quality priors), anchor text is the classic alias/mention source
for entity linking, and the (src, dst) edge table is what the graph
operators (operators/graph.py) consume.

Everything here is pure JVM column expressions over the pages table
(url, warc_ts, html, text, lang) - regexp_extract_all + explode + one
per-anchor projection; no Python in the hot path, no shuffle until the
(optional) host aggregation.  The HTML subset recognised (``<a ...>``
elements with a single- or double-quoted href) is the one our own page
renderer emits plus the standard crawl shapes; exotic markup degrades
to "no link", never to a wrong link.

URL resolution implements the RFC 3986 merge subset that covers crawl
reality, documented per-branch in `resolve_url`; dot-segment removal is
a bounded fixed-point (8 regex passes, i.e. up to 8 ``../`` or ``./``
segments per path) so the whole column stays a deterministic,
oracle-replayable expression.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.urls import canonicalize_url, host_of

# one <a ...>...</a> element, case-insensitive, body non-greedy so
# consecutive anchors split correctly; (?s) lets anchors span lines
_ANCHOR_RE = r"(?is)<a\b[^>]*>.*?</a>"
_HREF_DQ = r'(?is)\bhref\s*=\s*"([^"]*)"'
_HREF_SQ = r"(?is)\bhref\s*=\s*'([^']*)'"

#: schemes a crawler follows; anything else (mailto:, javascript:,
#: tel:, data:) is dropped at extraction time
FOLLOWED_SCHEMES = ("http", "https")

_DOT_SEGMENT_PASSES = 8


def _squash_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _remove_dot_segments(url: Column) -> Column:
    """Bounded RFC 3986 §5.2.4 dot-segment removal on an ABSOLUTE
    http(s) URL: '/./' collapses, 'seg/../' cancels, and leading '../'
    that would climb past the root clamp to the root (browser
    behaviour).  Each rule runs `_DOT_SEGMENT_PASSES` regex passes -
    a fixed, documented bound instead of an unbounded loop, so the
    expression stays pure-column and byte-deterministic."""
    # split authority off first so segment-cancelling can never eat the
    # host through the '//' of the scheme separator
    origin = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+)", 1)
    path = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+", "")
    for _ in range(_DOT_SEGMENT_PASSES):
        # '/./' -> '/' and a trailing '/.' -> '/'
        path = F.regexp_replace(path, r"/\.(/|$)", "/")
    for _ in range(_DOT_SEGMENT_PASSES):
        # 'segment/../' cancels (segment itself not '..'); trailing
        # 'segment/..' likewise
        path = F.regexp_replace(path, r"/(?!\.\./)[^/]+/\.\.(/|$)", "/")
    # leftover leading '/../..' climbed past the root: clamp (browsers do)
    path = F.regexp_replace(path, r"^(?:/\.\.)+(/|$)", "/")
    return F.when(origin == "", url).otherwise(F.concat(origin, path))


def resolve_url(base: Column, href: Column) -> Column:
    """Resolve `href` against the absolute page URL `base` (RFC 3986
    §5 subset).  Returns NULL for links a crawler drops:

    * ``scheme:...`` with scheme outside FOLLOWED_SCHEMES (mailto:,
      javascript:, tel:, data:);
    * empty href / fragment-only href resolves to the base itself
      (a self-link, kept - callers drop self-edges if they want);
    * ``//host/p``  -> base scheme + href (protocol-relative);
    * ``/p``        -> base origin + path;
    * ``p`` / ``../p`` -> merged onto the base directory, then
      dot-segments removed (bounded, see _remove_dot_segments).

    Fragments are stripped first (never sent to the server).  The
    whole thing is one nested CASE over regexes - column-pure, no
    Python."""
    h = F.trim(href)
    h = F.regexp_replace(h, r"#.*$", "")  # strip fragment
    scheme = F.lower(F.regexp_extract(h, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    base_nofrag = F.regexp_replace(base, r"#.*$", "")
    base_scheme = F.lower(
        F.regexp_extract(base_nofrag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    origin = F.regexp_extract(
        base_nofrag, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+)", 1)
    # base directory: strip query, then everything after the last '/'
    # of the path; a bare origin (no path) directs to origin + '/'
    base_noq = F.regexp_replace(base_nofrag, r"[?].*$", "")
    base_dir = F.when(
        F.regexp_extract(base_noq, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+(/.*)$",
                         1) == "",
        F.concat(origin, F.lit("/"))
    ).otherwise(F.regexp_replace(base_noq, r"[^/]*$", ""))

    resolved = (
        F.when(h == "", base_nofrag)
         .when(scheme.isin(*FOLLOWED_SCHEMES), h)
         .when(scheme != "", F.lit(None).cast("string"))
         .when(h.startswith("//"), F.concat(base_scheme, F.lit(":"), h))
         .when(h.startswith("/"), F.concat(origin, h))
         .otherwise(F.concat(base_dir, h)))
    return _remove_dot_segments(resolved)


def extract_links(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(src_url, dst_url, anchor_text) per followed hyperlink.

    Scale shape: narrow scan -> regexp_extract_all(anchor elements) ->
    explode -> per-anchor projection.  Column-pruned to (url, html),
    zero shuffles, whole-stage-codegen throughout; pages without html
    or without anchors simply contribute no rows.  anchor_text is the
    tag-stripped, whitespace-squashed inner text ('' for image-only
    anchors)."""
    html_str = F.col(html_col).cast("string")
    anchors = F.regexp_extract_all(html_str, F.lit(_ANCHOR_RE), 0)
    base = (pages
            .where(F.col(html_col).isNotNull())
            .select(F.col(url_col).alias("src_url"),
                    F.explode(anchors).alias("_a")))
    href_dq = F.regexp_extract(F.col("_a"), _HREF_DQ, 1)
    href_sq = F.regexp_extract(F.col("_a"), _HREF_SQ, 1)
    # double-quoted wins when present (regexp_extract returns '' on
    # no-match); an anchor with no href at all is dropped below
    has_dq = F.col("_a").rlike(_HREF_DQ)
    has_sq = F.col("_a").rlike(_HREF_SQ)
    href = F.when(has_dq, href_dq).when(has_sq, href_sq)
    inner = F.regexp_extract(F.col("_a"), r"(?is)^<a\b[^>]*>(.*)</a>$", 1)
    text = _squash_ws(F.regexp_replace(inner, r"(?s)<[^>]*>", " "))
    # rel tokens read from the OPEN tag only (inner markup of an anchor
    # can carry rel attributes of its own, e.g. nested <link> fragments)
    open_tag = F.regexp_extract(F.col("_a"), r"(?is)^<a\b[^>]*>", 0)
    rel = F.when(open_tag.rlike(_REL_DQ),
                 F.regexp_extract(open_tag, _REL_DQ, 1)) \
           .when(open_tag.rlike(_REL_SQ),
                 F.regexp_extract(open_tag, _REL_SQ, 1)) \
           .otherwise(F.lit(""))
    nofollow = F.array_contains(
        F.split(F.lower(_squash_ws(rel)), " "), "nofollow")
    return (base
            .withColumn("dst_url", resolve_url(F.col("src_url"), href))
            .where(F.col("dst_url").isNotNull())
            .select("src_url", "dst_url", text.alias("anchor_text"),
                    nofollow.alias("nofollow")))


_META_TAG_RE = r"(?is)<meta\b[^>]*>"
_ROBOTS_NAME_RE = r"""(?is)\bname\s*=\s*["']\s*robots\s*["']"""
_CONTENT_DQ = r'(?is)\bcontent\s*=\s*"([^"]*)"'
_CONTENT_SQ = r"(?is)\bcontent\s*=\s*'([^']*)'"
_REL_DQ = r'(?is)\brel\s*=\s*"([^"]*)"'
_REL_SQ = r"(?is)\brel\s*=\s*'([^']*)'"


def robots_directives(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """Page-level robots META directives (the REP's in-document half -
    robots.txt governs fetching, `<meta name="robots">` governs what an
    indexer may DO with a fetched page): (url, directives, noindex,
    nofollow) for EVERY input page - pages without a robots meta get an
    empty directive array and false flags.

    Parse rules: attribute order-insensitive, name value
    case-insensitive, content tokens comma-separated / trimmed /
    lowercased; multiple robots metas union their tokens (the
    restrictive reading every major indexer applies); `none` expands to
    noindex+nofollow per the de-facto standard.

    Scale shape: ZERO shuffle - the per-page tag array never leaves its
    row (regexp_extract_all -> higher-order filter/transform/flatten),
    so this is one codegen projection over the page scan, exactly the
    kind of full-corpus pass a 10^12-page policy sweep needs."""
    h = F.col(html_col).cast("string")
    tags = F.filter(F.regexp_extract_all(h, F.lit(_META_TAG_RE), 0),
                    lambda t: t.rlike(_ROBOTS_NAME_RE))
    content = lambda t: F.when(  # noqa: E731 - tiny per-tag chooser
        t.rlike(_CONTENT_DQ), F.regexp_extract(t, _CONTENT_DQ, 1)) \
        .when(t.rlike(_CONTENT_SQ), F.regexp_extract(t, _CONTENT_SQ, 1)) \
        .otherwise(F.lit(""))
    tokens = F.flatten(F.transform(
        tags, lambda t: F.transform(F.split(F.lower(content(t)), ","),
                                    lambda x: F.trim(x))))
    directives = F.array_sort(F.array_distinct(
        F.array_remove(F.coalesce(tokens, F.array()), "")))
    has = lambda d: F.array_contains(F.col("directives"), d)  # noqa: E731
    return (pages
            .select(F.col(url_col).alias("url"),
                    directives.alias("directives"))
            .withColumn("noindex", has("noindex") | has("none"))
            .withColumn("nofollow", has("nofollow") | has("none")))


def follow_edges(links: DataFrame, directives: DataFrame) -> DataFrame:
    """The link-graph rows an indexer may FOLLOW: drops anchors with a
    rel=nofollow token (extract_links' `nofollow` column) and every
    outgoing edge of a page whose robots meta says nofollow.  Left join
    on src_url (directives has exactly one row per page), so pages
    missing from `directives` default to followable - same openness
    default as RFC 9309."""
    pol = directives.select(F.col("url").alias("src_url"),
                            F.col("nofollow").alias("_page_nofollow"))
    return (links.join(pol, "src_url", "left")
            .where(~F.col("nofollow")
                   & ~F.coalesce(F.col("_page_nofollow"), F.lit(False)))
            .drop("_page_nofollow"))


def indexable_urls(directives: DataFrame) -> DataFrame:
    """URLs an indexer may index: the noindex rows removed. One narrow
    filter over the directives projection."""
    return directives.where(~F.col("noindex")).select("url")


def host_edges(links: DataFrame, drop_self: bool = False) -> DataFrame:
    """Host-level link graph: (src_host, dst_host, n_links).

    One uniform groupBy over lowercased host strings (map-side
    combinable; host keys are zipfian but the partial aggregation
    absorbs the skew exactly like the digest groupBys in dedup).  The
    output is the edge table host-PageRank / host curation consume.
    `drop_self` removes intra-host edges (navigation chrome) before
    the shuffle."""
    e = links.select(host_of(F.col("src_url")).alias("src_host"),
                     host_of(F.col("dst_url")).alias("dst_host"))
    if drop_self:
        e = e.where(F.col("src_host") != F.col("dst_host"))
    return (e.groupBy("src_host", "dst_host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_links")))


def anchor_alias_candidates(links: DataFrame,
                            min_count: int = 1) -> DataFrame:
    """Anchor-text alias dictionary: (alias, dst_canonical, n_links) -
    the classic mention->entity alias source (anchor text pointing at
    a page is a name for that page's entity).  Feeds
    operators/linking.py as the alias side of entity linking.

    alias = lowercased, whitespace-squashed anchor text; empty and
    URL-shaped anchors ('click http://...' navigation chrome) are
    dropped; dst is the canonical URL (operators/urls.py) so port/
    tracking-param variants of one page pool their evidence.  groupBy
    on (alias, dst) - two string keys, map-side combinable."""
    alias = F.lower(_squash_ws(F.col("anchor_text")))
    out = (links
           .select(alias.alias("alias"),
                   canonicalize_url(F.col("dst_url")).alias("dst_canonical"))
           .where((F.col("alias") != "")
                  & ~F.col("alias").rlike(r"^https?://"))
           .groupBy("alias", "dst_canonical")
           .agg(F.count(F.lit(1)).cast("long").alias("n_links")))
    if min_count > 1:
        out = out.where(F.col("n_links") >= min_count)
    return out


def link_pages_from_table(df: DataFrame, url_template: str,
                          links_template: list[tuple[str, str]],
                          key_col: str) -> DataFrame:
    """Render one small HTML page per row of `df`: the page URL is
    `url_template.format(**row)` and its body carries one ``<a>`` per
    (href_template, text_template) pair, each formatted with the row's
    columns.  Distributed (one applyInPandas over key groups, exactly
    like pages.pages_from_table); used by the driver queries so the
    DuckDB oracle can recompute the expected link graph relationally
    from the same source rows."""
    from .pages import PAGES_SCHEMA

    def make_pages(key, pdf: pd.DataFrame) -> pd.DataFrame:
        urls, htmls = [], []
        for row in pdf.sort_values(key_col, kind="mergesort") \
                      .to_dict("records"):
            body = "".join(
                f'<a href="{href.format(**row)}">{txt.format(**row)}</a>\n'
                for href, txt in links_template)
            urls.append(url_template.format(**row))
            htmls.append(f"<html><body>\n{body}</body></html>".encode())
        return pd.DataFrame({
            "url": urls,
            "warc_ts": [pd.Timestamp("2026-01-01")] * len(urls),
            "html": htmls,
            "text": [None] * len(urls),
            "lang": ["en"] * len(urls),
        })

    return df.groupBy(key_col).applyInPandas(make_pages, PAGES_SCHEMA)
