"""HTML -> text extraction (sources/webtext.py)."""

import pytest
from pyspark.sql import functions as F

from csvweb_spark.sources.webtext import (escape_html, extract_page_text,
                                          html_text, prose_pages_from_table)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, None, h.encode() if h is not None else None, None, "en")
         for u, h in rows],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(html_text(F.col("h")).alias("t")).collect()[0].t


def test_html_text_structure(spark):
    html = ("<html><head><title>META TITLE</title>"
            "<script>var x = '<p>not text</p>';</script></head>"
            "<body><style>p { color: red }</style>"
            "<!-- a comment\nspanning lines -->"
            "<h1>Main  Title</h1>"
            "<p>First <b>bold</b> paragraph.</p>"
            "<p>Second<br>with break.</p>"
            "<div>a div</div>"
            "<table><tr><td>c1</td><td>c2</td></tr></table>"
            "</body></html>")
    assert _extract(spark, html) == (
        "Main Title\n"
        "First bold paragraph.\n"
        "Second\n"
        "with break.\n"
        "a div\n"
        "c1 c2")


def test_html_text_entities_and_double_escape(spark):
    html = ("<p>a &lt; b &amp;&amp; c &gt; d</p>"
            "<p>&quot;q&quot; &#39;s&#39; &apos;t&apos; x&nbsp;y</p>"
            # escape('&lt;') = '&amp;lt;' must decode back to '&lt;'
            "<p>&amp;lt;literal&amp;gt;</p>"
            # entities outside the documented six pass through verbatim
            "<p>&copy; &#169;</p>")
    assert _extract(spark, html) == (
        "a < b && c > d\n"
        '"q" \'s\' \'t\' x y\n'
        "&lt;literal&gt;\n"
        "&copy; &#169;")


def test_html_text_whitespace_normalization(spark):
    html = "<p>  spaced\tout  </p>\n\n\n<p></p><p>next</p>"
    assert _extract(spark, html) == "spaced out\nnext"


def test_escape_round_trip(spark):
    src = 'tricky & <tags> "quotes" &amp; pre-escaped'
    assert _extract(spark, f"<p>{escape_html(src)}</p>") == src


def test_extract_page_text_null_html(spark):
    pages = _pages(spark, [("http://a.x/none", None),
                           ("http://a.x/p", "<p>hello</p>")])
    rows = extract_page_text(pages).collect()
    assert [(r.url, r.text) for r in rows] == [("http://a.x/p", "hello")]


def test_prose_pages_byte_identity(spark):
    """render -> extract round-trips born-normalized text BYTE-identically
    (the input_hint per-row invariant), title prepended."""
    docs = spark.createDataFrame(
        [(1, "first line & more\nsecond <line>"),
         (2, 'only "one" line')],
        "k long, body string")
    pages = prose_pages_from_table(
        docs, "http://d{k}.example.org/", "DOC {k}", "body", "k")
    got = {r.url: r.text for r in extract_page_text(pages).collect()}
    assert got == {
        "http://d1.example.org/": "DOC 1\nfirst line & more\nsecond <line>",
        "http://d2.example.org/": 'DOC 2\nonly "one" line',
    }


def test_html_text_plan_is_jvm_only(spark):
    pages = _pages(spark, [("http://x.example.org/", "<p>a</p>")])
    plan = extract_page_text(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_page_metadata_fields(spark):
    html = ('<html lang="en-GB"><head><title> The   Title </title>'
            '<meta name="description" content="a desc">'
            '<meta property="og:title" content="OG Title">'
            '<meta content="og desc reversed" property="og:description">'
            '<link rel="canonical" href="http://c.example.org/page">'
            '</head><body>x</body></html>')
    from csvweb_spark.sources.webtext import page_metadata
    pages = _pages(spark, [("http://a.example.org/p?utm_source=z", html),
                           ("http://a.example.org/bare", "<p>no head</p>")])
    rows = {r.url: r for r in page_metadata(pages).collect()}
    r = rows["http://a.example.org/p?utm_source=z"]
    assert r.title == "The Title"
    assert r.description == "a desc"
    assert r.og_title == "OG Title"
    assert r.og_description == "og desc reversed"   # reversed attr order
    assert r.canonical == "http://c.example.org/page"
    assert r.lang_hint == "en-GB"
    b = rows["http://a.example.org/bare"]
    assert (b.title, b.description, b.og_title, b.canonical,
            b.lang_hint) == (None, None, None, None, None)


def test_canonical_collapse(spark):
    from csvweb_spark.sources.webtext import canonical_collapse, page_metadata
    mk = lambda c: (f'<html><head><link rel="canonical" href="{c}">'
                    '</head><body>x</body></html>') if c else "<p>x</p>"
    pages = _pages(spark, [
        ("http://m1.example.org/a", mk("http://canon.example.org/x")),
        ("http://m2.example.org/b?utm_source=t",
         mk("http://canon.example.org/x?utm_campaign=z")),
        ("http://m3.example.org/c", mk(None)),
        ("http://m3.example.org/c?fbclid=q", mk(None)),
    ])
    out = {r.canonical_target: (r.n_pages, r.kept_url)
           for r in canonical_collapse(page_metadata(pages)).collect()}
    # declared canonicals pool (tracking params dropped on the target)
    assert out["http://canon.example.org/x"] == \
        (2, "http://m1.example.org/a")
    # undeclared pages pool on their own normalized URL
    assert out["http://m3.example.org/c"] == (2, "http://m3.example.org/c")


def test_page_metadata_plan_is_jvm_only(spark):
    from csvweb_spark.sources.webtext import page_metadata
    pages = _pages(spark, [("http://x.example.org/", "<title>t</title>")])
    plan = page_metadata(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- main-content extraction ----------------------------------------

from csvweb_spark.sources.webtext import extract_main_content, \
    main_content  # noqa: E402


def _main(spark, html, **kw):
    df = spark.createDataFrame([("u", html.encode())],
                               "url string, html binary")
    return extract_main_content(df, **kw).collect()[0]["main_text"]


def test_main_content_drops_nav_footer_keeps_prose(spark):
    html = ("<html><head><title>T</title><style>p{}</style></head><body>"
            '<div><a href="/">Home</a> <a href="/c">Catalog</a></div>'
            "<h1>Short head</h1>"
            "<p>This paragraph is long enough to be main content.</p>"
            "<p>tiny</p>"
            '<div>See <a href="/t">terms of service</a> and '
            '<a href="/p">privacy policy</a> here</div>'
            "</body></html>")
    assert _main(spark, html) == (
        "This paragraph is long enough to be main content.")


def test_main_content_allows_moderate_links(spark):
    html = ('<p>Brand X ships with <a href="/g">a guarantee</a> of '
            "quality parts for years</p>")
    got = _main(spark, html)
    assert got == ("Brand X ships with a guarantee of quality parts "
                   "for years")


def test_main_content_density_boundary(spark):
    # 30-char text, 10-char anchor: exactly 1/3 -> kept; 11 -> dropped
    base = "x" * 20
    kept = f"<p>{base}<a>0123456789</a></p>"
    dropped = f"<p>{'x' * 19}<a>01234567890</a></p>"
    assert _main(spark, kept) == base + "0123456789"
    assert _main(spark, dropped) == ""


def test_main_content_entities_and_order(spark):
    html = ("<p>First block of the article &amp; its opening line.</p>"
            "<div>Second block continues &lt;here&gt; with detail.</div>")
    assert _main(spark, html) == (
        "First block of the article & its opening line.\n"
        "Second block continues <here> with detail.")


def test_main_content_min_len_knob(spark):
    html = "<p>Twelve chars</p>"
    assert _main(spark, html) == ""
    assert _main(spark, html, min_len=5) == "Twelve chars"


# --- hreflang clusters ----------------------------------------------

from csvweb_spark.sources.webtext import hreflang_clusters, \
    hreflang_links  # noqa: E402


def test_hreflang_links_and_clusters(spark):
    def page(url, alts):
        links = "".join(
            f'<link rel="alternate" hreflang="{l}" href="{h}">'
            for l, h in alts)
        # decoy: alternate without hreflang (an RSS feed link)
        html = (f"<html><head>{links}"
                '<link rel="alternate" type="application/rss+xml" '
                'href="/feed"></head><body>x</body></html>')
        return (url, html.encode())

    en, fr = "http://a.org/en/p", "http://a.org/fr/p"
    df = spark.createDataFrame(
        [page(en, [("en", en), ("fr", fr)]),
         page(fr, [("hreflang", "")] if False else
              [("en", en), ("fr", fr)]),
         page("http://solo.org/", [])],
        "url string, html binary")
    links = hreflang_links(df)
    got = {(r["url"], r["hreflang"]): r["href"]
           for r in links.collect()}
    # the typeless feed link and the linkless page contribute nothing
    assert got == {(en, "en"): en, (en, "fr"): fr,
                   (fr, "en"): en, (fr, "fr"): fr}
    clusters = {r["url"]: (r["cluster_key"], r["n_langs"])
                for r in hreflang_clusters(links).collect()}
    assert clusters == {en: (en, 2), fr: (en, 2)}


def test_hreflang_attr_order_insensitive(spark):
    # rel LAST in the tag: attribute order must not matter
    html = ('<link href="http://a.org/de" hreflang="de" '
            'rel="alternate">')
    df = spark.createDataFrame([("u", html.encode())],
                               "url string, html binary")
    rows = hreflang_links(df).collect()
    assert [(r["hreflang"], r["href"]) for r in rows] == \
        [("de", "http://a.org/de")]


# ----------------------------------------- public suffix / eTLD+1

def test_registrable_domain_psl_algorithm(spark):
    from csvweb_spark.operators.urls import registrable_domain
    hosts = ["www.example.com", "example.co.uk", "a.b.example.co.uk",
             "foo.github.io", "github.io", "example.ck", "www.ck",
             "foo.www.ck", "b.example.ck", "localhost", "EXAMPLE.COM"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r.host: (r.public_suffix, r.registrable_domain)
           for r in registrable_domain(df).collect()}
    assert got["www.example.com"] == ("com", "example.com")
    assert got["example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["a.b.example.co.uk"] == ("co.uk", "example.co.uk")
    # private-domain rule: github.io is itself a suffix
    assert got["foo.github.io"] == ("github.io", "foo.github.io")
    assert got["github.io"] == ("github.io", None)
    # wildcard *.ck: every 2-label .ck host is a suffix
    assert got["example.ck"] == ("example.ck", None)
    assert got["b.example.ck"] == ("example.ck", "b.example.ck")
    # exception !www.ck beats the wildcard
    assert got["www.ck"] == ("ck", "www.ck")
    assert got["foo.www.ck"] == ("ck", "www.ck")
    # implicit '*' rule + a host that IS its own suffix
    assert got["localhost"] == ("localhost", None)
    # case-insensitive
    assert got["EXAMPLE.COM"] == ("com", "example.com")


def test_registrable_domain_parse_psl_and_plan(spark):
    from csvweb_spark.operators.urls import parse_psl, registrable_domain
    rules = parse_psl("""
// ===BEGIN ICANN DOMAINS===
com
// a comment
co.uk

*.ck
!www.ck
""")
    assert rules == ["com", "co.uk", "*.ck", "!www.ck"]
    df = spark.createDataFrame([("x.example.com",)], "host string")
    out = registrable_domain(df, rules=rules)
    assert out.collect()[0].registrable_domain == "example.com"
    plan = out._jdf.queryExecution().executedPlan().toString()
    # zero shuffle: fixed chain of broadcast joins over the scan
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


# ------------------------------------------------------- collocations

def test_collocations_counts_and_pmi(spark):
    import math

    import pytest
    from csvweb_spark.operators.text import collocations
    docs = spark.createDataFrame(
        [("d1", "new york is big"), ("d2", "New York and new jersey"),
         ("d3", "one"), ("d4", "")],
        "doc_id string, text string")
    rows = {(r.w1, r.w2): r for r in
            collocations(docs, min_pair_count=1).collect()}
    ny = rows[("new", "york")]
    # unigrams: new x3, york x2; pairs counted with multiplicity
    assert (ny.n_pair, ny.n_w1, ny.n_w2) == (2, 3, 2)
    n_uni = 4 + 5 + 1  # tokens of d1 + d2 + d3
    n_pairs = sum(r.n_pair for r in rows.values())
    assert n_pairs == 3 + 4  # adjacent pairs of d1 + d2
    expect = math.log(2 * n_uni * n_uni / (n_pairs * 3 * 2))
    assert ny.pmi == pytest.approx(expect)
    # min_pair_count prunes singleton pairs before the joins
    pruned = collocations(docs, min_pair_count=2)
    assert [(r.w1, r.w2) for r in pruned.collect()] == [("new", "york")]


def test_collocations_plan_partial_counts_no_python(spark):
    from csvweb_spark.operators.text import collocations
    docs = spark.createDataFrame([("d", "a b a b")],
                                 "doc_id string, text string")
    plan = collocations(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_compression_ratio_signal(spark):
    import zlib
    from csvweb_spark.operators.text import compression_ratio
    docs = spark.createDataFrame(
        [(1, "spam " * 200), (2, "the quick brown fox jumps over the "
                                 "lazy dog while mixed entropy text "
                                 "accumulates varied tokens 12345"),
         (3, ""), (4, None)],
        "doc_id long, text string")
    out = {r.doc_id: r.compress_bp
           for r in compression_ratio(docs).collect()}
    raw = ("spam " * 200).encode()
    assert out[1] == len(zlib.compress(raw, 6)) * 10000 // len(raw)
    assert out[1] < 500          # repetitive text compresses hard
    assert out[3] == 0 and out[4] is None
    # mixed-entropy text sits well above the spam ratio
    assert out[2] > out[1] * 3
    plan = compression_ratio(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" in plan and "Exchange" not in plan


# ----------------------------------------------------------- bigram LM


def test_bigram_lm_normalization_and_score(spark):
    from csvweb_spark.operators.text import (train_bigram_lm,
                                             score_documents_lm)
    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "")],
        "doc_id long, text string")
    pc, uc = train_bigram_lm(train)
    pairs = {(r.w1, r.w2): r.n_pair for r in pc.collect()}
    assert pairs == {("<s>", "the"): 2, ("the", "cat"): 2,
                     ("cat", "sat"): 1, ("cat", "ran"): 1}
    uni = {r.w: r.n_uni for r in uc.collect()}
    # history counts: properly normalized (sum of n_pair per w1)
    assert uni == {"<s>": 2, "the": 2, "cat": 2}
    V = len(uni)
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "dog"), (12, "  ")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           score_documents_lm(score, pc, uc, V).collect()}
    # doc 10: bigrams (<s>,the) np=2 nu=2; (the,cat) np=2 nu=2;
    # (cat,sat) np=1 nu=2 -> bp = 3*10000//5, 3*10000//5, 2*10000//5
    r = out[10]
    assert (r.n_bigrams, r.sum_prob_bp) == (3, 6000 + 6000 + 4000)
    assert r.avg_prob_bp == 16000 // 3
    # doc 11: unseen continuation from BOS: np=0 nu=2 -> 10000//5
    assert (out[11].n_bigrams, out[11].sum_prob_bp) == (1, 2000)
    # empty doc: absent
    assert 12 not in out
    import math
    want = math.log(3 / 5) * 2 + math.log(2 / 5)
    assert abs(r.logprob - want) < 1e-9


# ------------------------------------------------------------ page outline


def test_page_outline_order_levels_and_decode(spark):
    from csvweb_spark.sources.webtext import page_outline
    html = ("<html><body><h1 id='t'>Main &amp; Title</h1><p>x</p>"
            "<h2>First <b>Section</b></h2><h3></h3>"
            "<H2 class='s'>Second</H2></body></html>")
    df = spark.createDataFrame([("u1", html), ("u2", "<p>none</p>")],
                               "url string, html string")
    out = [(r.url, r.heading_ix, r.level, r.text)
           for r in page_outline(df).orderBy("url", "heading_ix").collect()]
    assert out == [("u1", 0, 1, "Main & Title"),
                   ("u1", 1, 2, "First Section"),
                   ("u1", 2, 3, ""),
                   ("u1", 3, 2, "Second")]


# -------------------------------------------------------------- readability


def test_readability_integer_formula(spark):
    from csvweb_spark.operators.text import readability
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, ""), (3, "word")],
        "doc_id long, text string")
    out = {r.doc_id: (r.n_words, r.n_sents, r.n_syll, r.fk_grade_bp)
           for r in readability(df).collect()}
    # doc 1: 6 words, 2 sent runs, syllable groups: e,a,a,e,o,a = 6
    w, s, y = 6, 2, 6
    want = 39 * 100 * w // s + 1180 * 100 * y // w - 155900
    assert out[1] == (w, s, y, want)
    assert 2 not in out                      # empty docs absent
    assert out[3][1] == 1 and out[3][2] == 1  # floors


def test_publish_dates_priority(spark):
    from csvweb_spark.sources.webtext import publish_dates
    rows = [
        ("http://a/2023/05/x",
         '<meta property="article:published_time" '
         'content="2022-01-02T10:00:00Z">'
         '<time datetime="2021-03-04">t</time>', "2022-01-02", "meta"),
        ("http://a/2023/05/x",
         '<time datetime="2021-03-04T08:00">t</time>',
         "2021-03-04", "time"),
        ("http://a/2023/05/09/x", "<p>n</p>", "2023-05-09", "url"),
        ("http://a/2023/05/x", "<p>n</p>", "2023-05-01", "url"),
        ("http://a/page", "<p>n</p>", None, "none"),
        ("http://a/page",
         '<meta name="date" content="garbage">', None, "none"),
    ]
    df = spark.createDataFrame([(u, h) for u, h, _, _ in rows],
                               "url string, html string")
    got = [(r.published, r.source) for r in publish_dates(df).collect()]
    assert got == [(p, s) for _, _, p, s in rows]


# ---------------------------------------------------------------------- BPE


def test_bpe_train_and_count_hand_computed(spark):
    from csvweb_spark.operators.text import (BPE_EOW, bpe_token_counts,
                                             train_bpe,
                                             word_frequencies)
    train = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "low lower")],
        "doc_id long, text string")
    wf = [(r.word, r.n) for r in word_frequencies(train).collect()]
    assert dict(wf) == {"low": 4, "lower": 2, "lowest": 1}
    merges = train_bpe(wf, n_merges=4)
    # hand-computed: pair counts round 1: (l,o)=7, (o,w)=7,
    # (w,</w>)=4, (w,e)=3, ... -> tie 7/7 breaks lexicographically
    # to (l,o); round 2 merges (lo,w)=7; round 3 (low,</w>)=4;
    # round 4 (low,e)=3
    assert merges == [("l", "o"), ("lo", "w"), ("low", BPE_EOW),
                      ("low", "e")]
    score = spark.createDataFrame(
        [(10, "low lowest banana"), (11, ""), (12, None)],
        "doc_id long, text string")
    out = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_counts(score, merges).collect()}
    # low -> [low</w>] = 1; lowest -> [lowe, s, t, </w>] = 4;
    # banana: no merges apply -> 6 chars + </w> = 7
    assert out == {10: 1 + 4 + 7, 11: 0, 12: 0}


def test_bpe_distributed_matches_driver_reference(spark):
    """train_bpe_distributed is output-identical to the collected-list
    train_bpe, including the a==b overlap-run greedy rule, lexicographic
    tie breaks and vocabulary exhaustion."""
    from csvweb_spark.operators.text import train_bpe, train_bpe_distributed
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
          ("aaa", 4), ("aaaa", 2), ("banana", 3), ("abab", 2)]
    ref = train_bpe(wc, 8)
    df = spark.createDataFrame(wc, "word string, n long")
    merges, syms = train_bpe_distributed(df, 8)
    try:
        assert merges == ref
        rows = {r["word"]: list(r["syms"]) for r in syms.collect()}
    finally:
        syms.unpersist()
    # greedy left-to-right over the ('a','a') run: 1st and (skipping the
    # consumed middle) 3rd starts merge -> aaa = [aa, a</w>]
    assert rows["aaa"] == ["aa", "a</w>"]
    # exhaustion: single-char words run out of pairs after the EOW merge
    wc2 = [("a", 3), ("b", 2)]
    m2, s2 = train_bpe_distributed(
        spark.createDataFrame(wc2, "word string, n long"), 5)
    s2.unpersist()
    assert m2 == train_bpe(wc2, 5) == [("a", "</w>"), ("b", "</w>")]


def test_bpe_merge_pair_fold_edges(spark):
    """The narrow-fold application step: overlap runs, flush-at-end,
    occurrence at array end, no-occurrence identity."""
    import pyspark.sql.functions as F
    from csvweb_spark.operators.text import bpe_merge_pair

    def apply(arr, left, right):
        df = spark.createDataFrame([(arr,)], "syms array<string>")
        return df.select(
            bpe_merge_pair(F.col("syms"), left, right).alias("o")
        ).head()["o"]

    assert apply(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert apply(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert apply(["x", "a", "b", "a", "b", "y"], "a", "b") \
        == ["x", "ab", "ab", "y"]
    assert apply(["a", "b"], "a", "b") == ["ab"]
    assert apply(["b", "a"], "a", "b") == ["b", "a"]  # pend flushes
    assert apply(["a"], "a", "b") == ["a"]
    assert apply(["c", "d"], "a", "b") == ["c", "d"]


def test_vocab_growth_hand_computed(spark):
    """Heaps curve buckets: first occurrences, log2(key+1) buckets,
    cumulative vocabulary; growth-free buckets emit no row."""
    from csvweb_spark.operators.text import vocab_growth
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (3, "d"), (7, "a b c"), (10, "e a")],
        "doc_id long, text string")
    rows = {r.bucket: (r.max_key, r.n_new_tokens, r.vocab_size)
            for r in vocab_growth(docs).collect()}
    # a,b first at key 0 -> bucket log2(1)=0; c at 1 -> bucket 1;
    # d at 3 -> bucket 2; e at 10 -> bucket 3; doc 7 adds nothing
    assert rows == {0: (0, 2, 2), 1: (1, 1, 3),
                    2: (3, 1, 4), 3: (10, 1, 5)}


def _drift_replay(groups, top_v):
    """Independent pure-Python replay of token_drift's contract."""
    from collections import Counter
    corpus = Counter(t for ts in groups.values() for t in ts)
    n = sum(corpus.values())
    top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    ct_top = sum(c for _, c in top)
    rows = {}
    for g, ts in groups.items():
        cg = Counter(ts)
        n_g = len(ts)
        drift, chi2, present, obs_p = 0, 0.0, 0, 0
        for t, c in top:
            obs = cg.get(t, 0)
            r_c = c * 10**6 // n
            if obs:
                present += 1
                obs_p += obs
                r_g = obs * 10**6 // n_g
                drift += (r_g - r_c) ** 2 // max(r_c, 1)
            else:
                drift += r_c
            e = n_g * c / n
            chi2 += (obs - e) ** 2 / e
        obs_o, ct_o = n_g - obs_p, n - ct_top
        rg_o, rc_o = obs_o * 10**6 // n_g, ct_o * 10**6 // n
        drift += (rg_o - rc_o) ** 2 // max(rc_o, 1)
        if ct_o > 0:
            e_o = n_g * ct_o / n
            chi2 += (obs_o - e_o) ** 2 / e_o
        rows[g] = (n_g, present, drift, chi2)
    return rows


def test_token_drift_matches_replay(spark):
    from csvweb_spark.operators.text import token_drift
    groups = {
        "conforming": ["the", "a", "of", "the", "a", "cat", "dog"],
        "spammy": ["buy", "buy", "buy", "now", "buy", "buy", "pills"],
        "tiny": ["the"],
    }
    df = spark.createDataFrame(
        [(g, " ".join(ts)) for g, ts in groups.items()],
        "source string, text string")
    got = {r.source: (r.n_tokens, r.n_cats_present, r.drift_ppm, r.chi2)
           for r in token_drift(df, "source", top_v=3).collect()}
    want = _drift_replay(groups, 3)
    assert set(got) == set(want)
    for g in want:
        assert got[g][:3] == want[g][:3], g
        assert got[g][3] == pytest.approx(want[g][3], rel=1e-9), g


def test_token_drift_flags_divergent_group(spark):
    from csvweb_spark.operators.text import token_drift
    # 9 groups share the corpus distribution; 1 is pure spam tokens
    rows = [(f"h{i}", "the quick brown fox jumps over the lazy dog")
            for i in range(9)]
    rows.append(("spam", "viagra casino viagra casino viagra"))
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r.drift_ppm
           for r in token_drift(df, "source", top_v=8).collect()}
    assert out["spam"] == max(out.values())
    assert out["spam"] > 10 * out["h0"]


def test_token_drift_group_outside_top_v(spark):
    from csvweb_spark.operators.text import token_drift
    # group "odd" has NO top-1 token: still gets a row, absent + OTHER
    # contributions only (replay-checked)
    groups = {"main": ["x"] * 10 + ["y"], "odd": ["z", "w", "z"]}
    df = spark.createDataFrame(
        [(g, " ".join(ts)) for g, ts in groups.items()],
        "source string, text string")
    got = {r.source: (r.n_tokens, r.n_cats_present, r.drift_ppm, r.chi2)
           for r in token_drift(df, "source", top_v=1).collect()}
    want = _drift_replay(groups, 1)
    assert got["odd"][:3] == want["odd"][:3]
    assert got["odd"][1] == 0
    assert got["main"][:3] == want["main"][:3]


def test_token_drift_validates(spark):
    from csvweb_spark.operators.text import token_drift
    df = spark.createDataFrame([("a", "x")], "source string, text string")
    with pytest.raises(ValueError):
        token_drift(df, "source", top_v=0)
