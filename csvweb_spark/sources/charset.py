"""Charset sniffing + decode for the ``html:binary`` pages column.

A Common-Crawl-style corpus (BASELINE.json input_hint: ``html:binary``)
is NOT all UTF-8: legacy windows-1252/ISO-8859-1 pages and UTF-16 BOMs
are endemic, and naively casting the binary column to string silently
mangles every non-UTF-8 byte.  This module is the decode stage between
the raw crawl bytes and every text consumer (`webtext.html_text`,
structured-data extraction, quality gates).

Sniffing follows the WHATWG/HTML5 prescan, restricted to the labels
that dominate real crawls (documented subset):

1. **BOM wins** (HTML5 encoding sniffing step 1): EF BB BF -> utf-8,
   FF FE -> utf-16le, FE FF -> utf-16be; the BOM bytes are stripped.
2. Else the first 1024 bytes are prescanned (decoded as ISO-8859-1,
   which never fails and preserves bytes) for
   ``<meta charset=...>`` / ``<meta http-equiv=content-type
   content="...; charset=...">`` in either quoting style.
3. Label normalization per the WHATWG encoding registry: the
   ``ascii`` / ``us-ascii`` / ``iso-8859-1`` / ``latin1`` labels are
   all windows-1252 (browsers never decode 0x80-0x9F as C1 controls);
   utf-16 without a BOM is taken as little-endian (the dominant form).
4. A ``utf-8``-labelled, unknown-labelled or unlabelled page is
   decoded UTF-8 only when its bytes actually validate
   (`is_valid_utf8` over the zero-copy binary->string reinterpret);
   otherwise it falls back to windows-1252, which decodes ANY byte
   sequence.  The emitted ``charset`` column reports the encoding
   actually USED.

Scale shape: every step is a JVM column expression - the BOM probe is
a 3-byte binary compare, the prescan a bounded regexp_extract, and the
windows-1252 decoder is ``decode(..., 'ISO-8859-1')`` followed by one
``translate`` of the 27 code points where cp1252 differs from latin-1
(0x80-0x9F minus the 5 undefined bytes) - zero Python, zero shuffles,
whole-stage codegen over the full crawl.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# cp1252 differs from ISO-8859-1 exactly on 0x80-0x9F; 5 bytes are
# undefined in cp1252 and pass through as the latin-1 C1 controls.
_CP1252_BYTES = [b for b in range(0x80, 0xA0)
                 if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)]
_LATIN1_SRC = "".join(chr(b) for b in _CP1252_BYTES)
_CP1252_DST = bytes(_CP1252_BYTES).decode("cp1252")

# WHATWG label registry, restricted to the families this module emits
_UTF8_LABELS = ("utf-8", "utf8", "unicode-1-1-utf-8")
_CP1252_LABELS = ("windows-1252", "cp1252", "x-cp1252", "iso-8859-1",
                  "iso8859-1", "iso_8859-1", "latin1", "latin-1",
                  "l1", "ascii", "us-ascii", "cp819", "ibm819")
_UTF16LE_LABELS = ("utf-16", "utf-16le", "unicode", "ucs-2")
_UTF16BE_LABELS = ("utf-16be",)

# one regex catches both <meta charset=X> and the http-equiv
# content="text/html; charset=X" form ('charset=' appears literally
# inside the meta tag either way); value may be quoted or bare
_META_CHARSET_RE = (r"(?is)<meta[^>]{0,512}?charset\s*=\s*"
                    r"[\"']?\s*([A-Za-z0-9._:\-]+)")

_MAXLEN = 2147483646  # substring 'rest of the value' length


def _bin_tail(html: Column, from_pos: int) -> Column:
    # F.substring accepts binary in Spark 4 and returns binary
    return F.substring(html, from_pos, _MAXLEN)


def _cp1252(binary: Column) -> Column:
    """windows-1252 decode of any byte sequence, pure JVM: latin-1
    (bijective on bytes) + translate of the 27 differing points."""
    return F.translate(F.decode(binary, "ISO-8859-1"),
                       _LATIN1_SRC, _CP1252_DST)


def sniff_charset(html: Column) -> Column:
    """The charset label this module will USE for `html` (binary):
    'utf-8' | 'windows-1252' | 'utf-16le' | 'utf-16be'.  NULL html ->
    NULL.  See the module docstring for the decision order."""
    return _decode(html)[1]


def decode_html(html: Column) -> Column:
    """Decoded string of the `html` binary column (see module
    contract).  NULL-safe."""
    return _decode(html)[0]


def _decode(html: Column) -> tuple[Column, Column]:
    prefix3 = F.substring(html, 1, 3)
    prefix2 = F.substring(html, 1, 2)
    bom8 = prefix3 == F.lit(bytes([0xEF, 0xBB, 0xBF]))
    bom16le = prefix2 == F.lit(bytes([0xFF, 0xFE]))
    bom16be = prefix2 == F.lit(bytes([0xFE, 0xFF]))
    # BOM-less UTF-16 markup probe (HTML5 sniffing): a document whose
    # first character is '<' shows as 3C 00 (LE) / 00 3C (BE) - the
    # byte-oriented meta prescan below cannot see NUL-interleaved text
    nobom16le = prefix2 == F.lit(bytes([0x3C, 0x00]))
    nobom16be = prefix2 == F.lit(bytes([0x00, 0x3C]))

    prescan = F.decode(F.substring(html, 1, 1024), "ISO-8859-1")
    label = F.lower(F.regexp_extract(prescan, _META_CHARSET_RE, 1))

    # utf-8 validity of the (BOM-stripped) bytes via the zero-copy
    # binary->string reinterpret; NULL-safe (NULL html -> NULL -> kept
    # NULL by every branch below)
    valid8 = F.is_valid_utf8(html.cast("string"))
    valid8_after_bom = F.is_valid_utf8(_bin_tail(html, 4).cast("string"))

    utf8_cast = html.cast("string")
    utf8_after_bom = _bin_tail(html, 4).cast("string")

    charset = (
        F.when(bom16le, F.lit("utf-16le"))
         .when(bom16be, F.lit("utf-16be"))
         .when(bom8, F.when(valid8_after_bom, F.lit("utf-8"))
                      .otherwise(F.lit("windows-1252")))
         .when(nobom16le, F.lit("utf-16le"))
         .when(nobom16be, F.lit("utf-16be"))
         .when(label.isin(*_UTF16LE_LABELS), F.lit("utf-16le"))
         .when(label.isin(*_UTF16BE_LABELS), F.lit("utf-16be"))
         .when(label.isin(*_CP1252_LABELS), F.lit("windows-1252"))
         .when(valid8, F.lit("utf-8"))
         .otherwise(F.lit("windows-1252")))
    # re-mask NULL input (when/otherwise chains resolve NULL conditions
    # to the otherwise branch)
    charset = F.when(html.isNull(), F.lit(None).cast("string")) \
               .otherwise(charset)

    text = (
        F.when(bom16le, F.decode(_bin_tail(html, 3), "UTF-16LE"))
         .when(bom16be, F.decode(_bin_tail(html, 3), "UTF-16BE"))
         .when(bom8, F.when(valid8_after_bom, utf8_after_bom)
                      .otherwise(_cp1252(_bin_tail(html, 4))))
         .when(nobom16le, F.decode(html, "UTF-16LE"))
         .when(nobom16be, F.decode(html, "UTF-16BE"))
         .when(label.isin(*_UTF16LE_LABELS),
               F.decode(html, "UTF-16LE"))
         .when(label.isin(*_UTF16BE_LABELS),
               F.decode(html, "UTF-16BE"))
         .when(label.isin(*_CP1252_LABELS), _cp1252(html))
         .when(valid8, utf8_cast)
         .otherwise(_cp1252(html)))
    return text, charset


def decode_pages(pages: DataFrame, html_col: str = "html",
                 out_col: str = "html_str") -> DataFrame:
    """pages + (`out_col`: decoded html string, `charset`: the
    encoding used).  One narrow projection - the decode stage every
    raw-crawl consumer composes under (e.g.
    ``extract_page_text(decode_pages(p), html_col='html_str')``)."""
    text, charset = _decode(F.col(html_col))
    return (pages
            .withColumn(out_col, text)
            .withColumn("charset", charset))


def fix_mojibake(text: Column) -> Column:
    """Repair UTF-8-as-cp1252 mojibake in an already-decoded STRING
    column ('cafÃ©' -> 'café', 'â€œ' -> '“', 'ä¸­æ–‡' -> '中文'):
    the single most common crawl corruption - a UTF-8 page served or
    archived under a windows-1252 (or defaulted) label, so every
    multi-byte sequence surfaces as 2-4 Latin-1/cp1252 characters.

    The repair INVERTS one cp1252 decode entirely JVM-side: translate
    the 27 cp1252-specific code points back to their 0x80-0x9F byte
    positions, re-encode ISO-8859-1 (bijective on chars <= U+00FF),
    and re-decode UTF-8. Three gates keep it safe on clean text, all
    evaluated before the rewrite is taken (lazy If branches - the
    encode never sees non-latin chars, the decode never sees invalid
    bytes):

      1. every char must be cp1252-encodable (post-translate
         ^[\\x00-\\xFF]*$) - genuinely multilingual text is untouched;
      2. the recovered bytes must be VALID UTF-8 (`is_valid_utf8`) -
         ordinary Western text with isolated accents ('plain café')
         produces invalid sequences and is untouched;
      3. the decode must actually change something.

    A string that intentionally spells a valid multi-byte sequence
    ('Ã©' as literal content) is indistinguishable from mojibake by
    construction (ftfy's documented caveat) and is repaired; that is
    the accepted trade - such sequences essentially never occur in
    intentional text. NULL stays NULL. Apply twice for double-encoded
    mojibake (the repair is idempotent once clean).

    One narrow whole-stage-codegen projection: translate + regexp +
    encode/decode + is_valid_utf8 are all JVM expressions - zero
    Python, zero shuffle, full-crawl cost class."""
    trans = F.translate(text, _CP1252_DST, _LATIN1_SRC)
    enc_ok = trans.rlike(r"^[\x00-\xFF]*$")
    # Spark 4's Encode RAISES on unmappable chars, and codegen CSE
    # hoists shared subexpressions out of If branches - so the encode
    # input must be masked, not merely guarded by the When condition
    back = F.encode(F.when(enc_ok, trans).otherwise(F.lit("")),
                    "ISO-8859-1")
    repaired = F.decode(back, "UTF-8")
    cond = (enc_ok
            & F.is_valid_utf8(back.cast("string"))
            & (repaired != text))
    return F.when(cond, repaired).otherwise(text)


def add_mojibake_repair(df, text_col: str = "text",
                        out_col: str = "text_fixed") -> "DataFrame":
    """DataFrame form: adds `out_col` (repaired text) and
    `<out_col>_applied` (boolean audit flag - what fraction of a crawl
    slice was mis-labeled is itself a source-quality signal)."""
    fixed = fix_mojibake(F.col(text_col))
    return (df.withColumn(out_col, fixed)
            .withColumn(out_col + "_applied",
                        F.coalesce(F.col(out_col) != F.col(text_col),
                                   F.lit(False))))
