"""Fuse the three embedded-markup channels (JSON-LD, microdata, RDFa)
into ONE provenance-tracked triple table — the structured-data fusion
step of web-scale KG construction.

A real page frequently asserts the SAME fact through more than one
channel (schema.org recommends JSON-LD, legacy templates still carry
microdata, OpenGraph metas are RDFa), and the channels use different
lexical conventions for the same RDF value.  A KG builder wants one
deduplicated triple per page with the set of channels corroborating
it: cross-channel agreement is a precision signal (``n_channels >= 2``
is the classic high-confidence slice), single-channel facts are the
review queue, and the channel list is per-triple provenance for
downstream lineage.

No reference counterpart: csvweb converts one channel (CSVW metadata,
``Rdf/Converter.cs:326``); the page-markup channels and their fusion
are SURVEY §2.8 [new] surface.

Scale shape (100 TB pages table)
--------------------------------
* One branch per channel over the SAME ``(url, html)`` scan.  Each
  branch keeps its channel's JVM prune (``contains('itemscope')``,
  ``contains('ld+json')``, ``contains('property=')`` ...), so pages
  without a given markup never reach that channel's Arrow stage, and
  the three parquet scans are cheap columnar re-reads of two columns —
  no cache dependency, no correctness coupling between branches.
* Blank-node labels are already channel-namespaced at mint time
  (``_:jl…`` / ``_:md…`` / ``_:ra…``), so the union can never conflate
  an id-less JSON-LD node with an id-less microdata item.
* RDF 1.1 literal normalization (a plain literal with no language tag
  IS an ``xsd:string`` literal, RDF 1.1 Concepts §3.3) runs BEFORE the
  dedup groupBy so equal facts from channels with different datatype
  conventions actually merge.
* The provenance groupBy shuffles on the full 7-column triple key:
  map-side combinable (``collect_set`` over <= 3 small channel tags),
  and the key space is the triple space itself — no hub key can
  concentrate a partition the way a subject- or predicate-keyed
  aggregation could.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from .jsonld import jsonld_triples
from .microdata import microdata_triples
from .rdfa import rdfa_triples

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

#: channel tag -> extractor; all emit the same 7-column quad shape
#: (url, subj, pred, obj, obj_kind, obj_datatype, obj_lang)
CHANNEL_EXTRACTORS = {
    "jsonld": jsonld_triples,
    "microdata": microdata_triples,
    "rdfa": rdfa_triples,
}

TRIPLE_KEY = ["url", "subj", "pred", "obj", "obj_kind", "obj_datatype",
              "obj_lang"]


def normalize_plain_literals(df: DataFrame) -> DataFrame:
    """RDF 1.1 Concepts §3.3: a literal with neither datatype IRI nor
    language tag is an ``xsd:string`` literal.  Applied before fusion
    so channels that leave plain literals untyped (RDFa) merge with
    channels that type them eagerly (JSON-LD, microdata)."""
    plain = ((F.col("obj_kind") == "literal")
             & F.col("obj_lang").isNull()
             & F.col("obj_datatype").isNull())
    return df.withColumn(
        "obj_datatype",
        F.when(plain, F.lit(XSD_STRING)).otherwise(F.col("obj_datatype")))


def markup_triples(pages: DataFrame,
                   channels: tuple[str, ...] = ("jsonld", "microdata",
                                                "rdfa"),
                   url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """Union of per-channel quads, each row tagged with its ``channel``.

    Not yet deduplicated — this is the raw multi-channel assertion log
    (useful on its own for channel-coverage audits)."""
    if not channels:
        raise ValueError("markup_triples: need at least one channel")
    parts = []
    for name in channels:
        try:
            extract = CHANNEL_EXTRACTORS[name]
        except KeyError:
            raise ValueError(
                f"unknown markup channel {name!r}; "
                f"known: {sorted(CHANNEL_EXTRACTORS)}") from None
        parts.append(extract(pages, url_col=url_col, html_col=html_col)
                     .withColumn("channel", F.lit(name)))
    return reduce(DataFrame.unionByName, parts)


def fuse_markup_triples(pages: DataFrame,
                        channels: tuple[str, ...] = ("jsonld", "microdata",
                                                     "rdfa"),
                        url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """One row per distinct (page, RDF-normalized triple) with
    provenance: ``channels`` = comma-joined sorted channel tags that
    asserted it, ``n_channels`` = how many.

    ``n_channels >= 2`` is the cross-channel-corroborated slice a KG
    release pipeline promotes without review."""
    raw = normalize_plain_literals(
        markup_triples(pages, channels, url_col, html_col))
    grouped = raw.groupBy(*TRIPLE_KEY).agg(
        F.array_sort(F.collect_set("channel")).alias("_chset"))
    return grouped.select(
        *TRIPLE_KEY,
        F.array_join("_chset", ",").alias("channels"),
        F.size("_chset").alias("n_channels"))
