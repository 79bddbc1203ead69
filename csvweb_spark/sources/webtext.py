"""HTML -> text extraction: deriving the `text` column from `html`.

The pages-table contract (BASELINE.json input_hint) carries BOTH
``html:binary`` and ``text:string`` with the per-row invariant
"byte-identical extracted text per url" - this module is the stage that
PRODUCES the text column when a crawl delivers raw HTML only.  The
reference has no equivalent (csvweb consumes CSV); at crawl scale this
runs on every page, so it must be a narrow JVM pass: the whole operator
is one chain of regexp_replace / higher-order array expressions -
zero Python, zero shuffles, whole-stage codegen.

Extraction contract (each step a deterministic, DuckDB-replayable
string transform, applied in this order):

1. drop ``<head>``/``<script>``/``<style>`` elements wholesale and
   ``<!-- -->`` comments (metadata and code are not prose);
2. closing block-level tags (``</p> </div> </li> </tr> </h1..6>
   </blockquote> </title>``) and ``<br>`` become newlines - paragraph
   structure survives;
3. cell boundaries (``</td> </th>``) become single spaces;
4. every remaining tag is deleted (inline markup like ``<b>`` must not
   split words);
5. the six ubiquitous named entities decode - ``&lt; &gt; &quot;
   &#39; &apos; &nbsp;`` then ``&amp;`` LAST, so a single decode pass
   exactly inverts a single escape pass (escape("&lt;") = "&amp;lt;"
   round-trips); other numeric/named entities pass through verbatim
   (documented subset - full HTML5 entity tables need a real parser);
6. whitespace normalization: within each line runs of spaces/tabs
   collapse to one space and the line is trimmed; empty lines drop;
   lines re-join with single newlines.

Because step 6 is idempotent, text that was BORN normalized (one
trimmed non-empty paragraph per line) round-trips byte-identically
through render -> extract - that is the invariant `web_extract_text`
checks against the oracle and `test_webtext.py` pins per byte.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DROP_BLOCKS = (r"(?is)<head\b[^>]*>.*?</head>"
                r"|<script\b[^>]*>.*?</script>"
                r"|<style\b[^>]*>.*?</style>"
                r"|<!--.*?-->")
_NEWLINE_TAGS = r"(?i)<(?:br\s*/?|/p|/div|/li|/tr|/h[1-6]|/blockquote|/title)>"
_SPACE_TAGS = r"(?i)<(?:/td|/th)>"
_ANY_TAG = r"(?s)<[^>]*>"

# decode order matters: &amp; strictly last (see module docstring)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
             ("&amp;", "&")]


def html_text(html: Column) -> Column:
    """Extracted text of one HTML string column (see module contract).
    NULL html -> NULL text."""
    t = F.regexp_replace(html, _DROP_BLOCKS, " ")
    t = F.regexp_replace(t, _NEWLINE_TAGS, "\n")
    t = F.regexp_replace(t, _SPACE_TAGS, " ")
    t = F.regexp_replace(t, _ANY_TAG, "")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    lines = F.split(t, "\n")
    cleaned = F.transform(
        lines, lambda l: F.trim(F.regexp_replace(l, r"[ \t\r]+", " ")))
    kept = F.filter(cleaned, lambda l: l != "")
    return F.array_join(kept, "\n")


def extract_page_text(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(url, text) for every page with an html payload - the
    text-column producer for raw-HTML crawls.  One narrow projection;
    pages without html contribute no rows (their text, if any, is
    already present in the source table)."""
    return (pages
            .where(F.col(html_col).isNotNull())
            .select(F.col(url_col).alias("url"),
                    html_text(F.col(html_col).cast("string"))
                    .alias("text")))


# --- main-content extraction (boilerplate removal) ------------------
# jusText/Arc90-style block classification, reduced to two
# deterministic rules a JVM higher-order chain can evaluate: a block
# survives iff its text is long enough AND not link-dominated.
_BLOCK_SPLIT = (r"(?i)</?(?:p|div|li|ul|ol|tr|td|th|table|h[1-6]|"
                r"blockquote|section|article|main|header|footer|nav|"
                r"aside|br)\b[^>]*/?>")
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def _block_text(seg: Column) -> Column:
    t = F.regexp_replace(seg, _ANY_TAG, "")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"[ \t\r\n]+", " "))


def main_content(html: Column, min_len: int = 25,
                 max_link_density: float = 1 / 3) -> Column:
    """Boilerplate-stripped main text of one HTML string column.

    Blocks are the segments between block-level tags (after dropping
    head/script/style/comments wholesale); a block is MAIN CONTENT iff

    * its squashed text length >= `min_len` (navigation crumbs,
      headings, 'read more' stubs fall under it), and
    * its anchor-text share <= `max_link_density` (nav bars, footer
      link farms, related-article lists are link-dominated even when
      long).

    Surviving blocks join with newlines in document order.  The whole
    classifier is one JVM split/transform/filter chain over the page
    string - per-page map work, no Python, no shuffle - so it runs as
    a full-crawl stage at the same cost class as `html_text`."""
    t = F.regexp_replace(html, _DROP_BLOCKS, " ")
    segs = F.split(t, _BLOCK_SPLIT)
    blocks = F.transform(segs, lambda s: F.struct(
        _block_text(s).alias("txt"),
        F.aggregate(F.regexp_extract_all(s, F.lit(_ANCHOR_RE), 1),
                    F.lit(0),
                    lambda acc, a: acc + F.length(_block_text(a)))
        .alias("alen")))
    kept = F.filter(
        blocks,
        lambda b: (F.length(b["txt"]) >= F.lit(min_len))
        & (b["alen"].cast("double")
           <= F.length(b["txt"]) * F.lit(float(max_link_density))))
    return F.array_join(F.transform(kept, lambda b: b["txt"]), "\n")


def extract_main_content(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html", min_len: int = 25,
                         max_link_density: float = 1 / 3) -> DataFrame:
    """(url, main_text) per page - the curation-grade text producer
    (html_text keeps ALL prose; this keeps only content blocks)."""
    return (pages
            .where(F.col(html_col).isNotNull())
            .select(F.col(url_col).alias("url"),
                    main_content(F.col(html_col).cast("string"),
                                 min_len, max_link_density)
                    .alias("main_text")))


_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_CANONICAL_RE = (r"(?is)<link\b[^>]*rel\s*=\s*[\"']canonical[\"'][^>]*"
                 r"href\s*=\s*[\"']([^\"']*)[\"']")
_HTML_LANG_RE = r"(?is)<html\b[^>]*\blang\s*=\s*[\"']([^\"']*)[\"']"


def _meta_content(html: Column, key_attr: str, key: str) -> Column:
    """content= of the first ``<meta name=.../property=...>`` tag with
    the given key, attribute order-insensitive (both orders occur in
    the wild; two alternates beat a permutation regex)."""
    a = (rf"(?is)<meta\b[^>]*{key_attr}\s*=\s*[\"']{key}[\"'][^>]*"
         rf"content\s*=\s*[\"']([^\"']*)[\"']")
    b = (rf"(?is)<meta\b[^>]*content\s*=\s*[\"']([^\"']*)[\"'][^>]*"
         rf"{key_attr}\s*=\s*[\"']{key}[\"']")
    first = F.regexp_extract(html, a, 1)
    return F.when(first != "", first).otherwise(
        F.regexp_extract(html, b, 1))


def _nullify(col: Column) -> Column:
    return F.when(col == "", F.lit(None).cast("string")).otherwise(col)


def page_metadata(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """Head-metadata panel per page: (url, title, description,
    og_title, og_description, canonical, lang_hint).

    * title        - first <title> text, whitespace-squashed
    * description  - <meta name="description" content=...>
    * og_title / og_description - the Open Graph properties
    * canonical    - <link rel="canonical" href=...>, the publisher's
                     own duplicate-collapse signal: grouping crawl
                     variants by coalesce(canonical, canonical_url(url))
                     beats URL normalization alone
    * lang_hint    - the <html lang=...> attribute (feeds/validates
                     the lang column and the lang_detect operator)

    Missing fields are NULL.  One narrow JVM projection - at crawl
    scale this is a per-page map with no Python and no shuffle."""
    h = F.col(html_col).cast("string")
    title = F.trim(F.regexp_replace(
        F.regexp_extract(h, _TITLE_RE, 1), r"\s+", " "))
    return (pages
            .where(F.col(html_col).isNotNull())
            .select(
                F.col(url_col).alias("url"),
                _nullify(title).alias("title"),
                _nullify(_meta_content(h, "name", "description"))
                .alias("description"),
                _nullify(_meta_content(h, "property", "og:title"))
                .alias("og_title"),
                _nullify(_meta_content(h, "property", "og:description"))
                .alias("og_description"),
                _nullify(F.regexp_extract(h, _CANONICAL_RE, 1))
                .alias("canonical"),
                _nullify(F.regexp_extract(h, _HTML_LANG_RE, 1))
                .alias("lang_hint")))


def canonical_collapse(meta: DataFrame) -> DataFrame:
    """Publisher-declared duplicate collapse: group pages on the
    canonical target (declared <link rel=canonical> when present, else
    the normalized URL itself) and keep the deterministic min-url
    representative - (canonical_target, n_pages, kept_url).  The
    companion to urls.dedup_urls for crawls where mirrors/trackers
    declare their canonical; one uniform groupBy."""
    from ..operators.urls import canonicalize_url
    target = F.coalesce(canonicalize_url(F.col("canonical")),
                        canonicalize_url(F.col("url")))
    return (meta
            .select(target.alias("canonical_target"), F.col("url"))
            .groupBy("canonical_target")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                 F.min("url").alias("kept_url")))


_HREFLANG_RE = (r"(?is)<link\b[^>]*rel\s*=\s*[\"']alternate[\"'][^>]*>")
_HREFLANG_LANG_RE = r"(?is)\bhreflang\s*=\s*[\"']([^\"']*)[\"']"
_HREFLANG_HREF_RE = r"(?is)\bhref\s*=\s*[\"']([^\"']*)[\"']"


def hreflang_links(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """(url, hreflang, href) for every ``<link rel="alternate"
    hreflang=..>`` declaration - the publisher's own statement that
    `href` is the same content in another language.  JVM
    regexp_extract_all over the alternate links + per-tag attribute
    extraction (attribute order-insensitive), explode, no Python."""
    h = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(h, F.lit(_HREFLANG_RE), 0)
    exploded = (pages
                .where(F.col(html_col).isNotNull())
                .select(F.col(url_col).alias("url"),
                        F.explode(tags).alias("_tag")))
    lang = F.regexp_extract(F.col("_tag"), _HREFLANG_LANG_RE, 1)
    href = F.regexp_extract(F.col("_tag"), _HREFLANG_HREF_RE, 1)
    return (exploded
            .select("url", lang.alias("hreflang"), href.alias("href"))
            .where((F.col("hreflang") != "") & (F.col("href") != "")))


def hreflang_clusters(links: DataFrame) -> DataFrame:
    """Language-variant clusters from hreflang declarations: the
    cluster key is the minimum URL over the page's declared alternate
    set INCLUDING itself (well-formed hreflang is bidirectional and
    self-referential per Google's spec, so every member derives the
    same key locally - no graph closure needed; pages that disagree
    simply land in different clusters, which is the honest reading).
    Returns (cluster_key, url, n_langs) - one row per member page.
    One map-side min + one groupBy; the i18n twin of
    `canonical_collapse`."""
    per_page = (links
                .groupBy("url")
                .agg(F.min("href").alias("_min_href"),
                     F.countDistinct("hreflang").alias("n_langs")))
    return per_page.select(
        F.least(F.col("_min_href"), F.col("url")).alias("cluster_key"),
        "url", "n_langs")


def escape_html(s: str) -> str:
    """The single-pass escape html_text's entity decode inverts."""
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def prose_pages_from_table(df: DataFrame, url_template: str,
                           title_template: str, text_col: str,
                           key_col: str) -> DataFrame:
    """Render one prose HTML page per row: a <title>/<h1> from
    `title_template`, a decoy <script>, and one entity-escaped ``<p>``
    per line of `text_col`.  Distributed applyInPandas like the other
    page renderers; lets the oracle recompute the expected extracted
    text relationally from the same rows (title + normalized lines)."""
    from .pages import PAGES_SCHEMA

    def make_pages(key, pdf: pd.DataFrame) -> pd.DataFrame:
        urls, htmls = [], []
        for row in pdf.sort_values(key_col, kind="mergesort") \
                      .to_dict("records"):
            title = escape_html(title_template.format(**row))
            paras = "".join(
                f"<p>{escape_html(line)}</p>\n"
                for line in str(row[text_col]).split("\n"))
            html = (f"<html><head><title>{title}</title></head>"
                    "<body><script>var hidden = 1;</script>"
                    "<style>p { color: red; }</style>"
                    f"<!-- boilerplate --><h1>{title}</h1>\n"
                    f"{paras}</body></html>")
            urls.append(url_template.format(**row))
            htmls.append(html.encode())
        return pd.DataFrame({
            "url": urls,
            "warc_ts": [pd.Timestamp("2026-01-01")] * len(urls),
            "html": htmls,
            "text": [None] * len(urls),
            "lang": ["en"] * len(urls),
        })

    return df.groupBy(key_col).applyInPandas(make_pages, PAGES_SCHEMA)


_HEADING_RE = r"(?is)<h[1-6][^>]*>.*?</h[1-6]>"


def page_outline(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """Document outline: one row per heading element in DOCUMENT ORDER
    - (url, heading_ix, level, text). The structure signal section-
    aware chunking wants (chunk boundaries at h2/h3 beat fixed token
    windows for retrieval), and a cheap page-topic summary for
    curation/linking (headings name the entities the page is about).

    Pure JVM: ONE regexp_extract_all collects the heading elements
    (order-preserving by construction), posexplode numbers them, and
    the inner text goes through the same tag-strip + entity-decode +
    whitespace-squash contract as `html_text` (nested inline markup
    like <b> inside a heading strips cleanly; a heading closed by a
    mismatched level closes at the first </hN> - lenient, like the
    rest of this module). Empty headings are kept (heading_ix stays
    the true document position) with text ''. Zero Python, zero
    shuffle - full-crawl cost class."""
    matches = F.regexp_extract_all(F.col(html_col), F.lit(_HEADING_RE),
                                   0)
    out = (pages.select(F.col(url_col).alias("url"),
                        F.posexplode(matches).alias("heading_ix", "_h"))
           .withColumn("level",
                       F.regexp_extract("_h", r"(?i)<h([1-6])", 1)
                       .cast("int")))
    t = F.regexp_replace(F.col("_h"), _ANY_TAG, "")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return out.select("url", F.col("heading_ix").cast("long")
                      .alias("heading_ix"), "level", t.alias("text"))


_META_PUBLISHED_RE = (r"(?is)<meta\b[^>]*(?:property|name)\s*=\s*"
                      r"[\"'](?:article:published_time|"
                      r"datePublished|date)[\"'][^>]*"
                      r"content\s*=\s*[\"']([^\"']*)[\"']")
_TIME_TAG_RE = r"(?is)<time\b[^>]*datetime\s*=\s*[\"']([^\"']*)[\"']"
_URL_DATE_RE = r"/((?:19|20)\d{2})/(\d{2})(?:/(\d{2}))?(?:/|$)"
_ISO_PREFIX_RE = r"^((?:19|20)\d{2}-\d{2}-\d{2})"


def publish_dates(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """Publication-date extraction per page: (url, published, source)
    with `published` an ISO yyyy-mm-dd string and `source` naming the
    winning signal - the freshness axis temporal curation and recency
    weighting need, independent of warc_ts (fetch time is NOT publish
    time).

    Priority (the trafilatura-family order, first hit wins):
      1. 'meta'  - <meta property="article:published_time"|
         name="datePublished"|name="date" content=...> with a valid
         ISO date prefix;
      2. 'time'  - the first <time datetime=...> ISO prefix;
      3. 'url'   - a /YYYY/MM[/DD]/ path segment (day defaults 01);
    else NULL/'none'. Validation is the ISO-prefix shape only
    (yyyy-mm-dd, years 19xx/20xx) - parsing beyond that is the
    caller's policy. One narrow JVM regex projection, zero Python,
    zero shuffle."""
    h = F.col(html_col).cast("string")
    meta_iso = F.regexp_extract(
        F.regexp_extract(h, _META_PUBLISHED_RE, 1), _ISO_PREFIX_RE, 1)
    time_iso = F.regexp_extract(
        F.regexp_extract(h, _TIME_TAG_RE, 1), _ISO_PREFIX_RE, 1)
    u = F.col(url_col)
    uy = F.regexp_extract(u, _URL_DATE_RE, 1)
    um = F.regexp_extract(u, _URL_DATE_RE, 2)
    ud = F.regexp_extract(u, _URL_DATE_RE, 3)
    url_iso = F.when(
        (uy != "") & (um != ""),
        F.concat_ws("-", uy, um,
                    F.when(ud == "", F.lit("01")).otherwise(ud))) \
        .otherwise(F.lit(""))
    published = F.when(meta_iso != "", meta_iso) \
        .when(time_iso != "", time_iso) \
        .when(url_iso != "", url_iso)
    source = F.when(meta_iso != "", F.lit("meta")) \
        .when(time_iso != "", F.lit("time")) \
        .when(url_iso != "", F.lit("url")).otherwise(F.lit("none"))
    return pages.select(u.alias("url"), published.alias("published"),
                        source.alias("source"))
