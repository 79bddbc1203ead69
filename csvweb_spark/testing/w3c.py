"""W3C CSVW csv2rdf test-suite harness (manifest-driven).

Python re-expression of the reference's conformance harness
(Tests/CsvwTestCasesSpec.cs): serve the fixture corpus logically at a base
URL, run each manifest-rdf entry through the conversion kernel with the
reference's metadata-discovery order (Rdf/Converter.cs:88-123,141-207),
and compare to the expected Turtle graph blank-node-insensitively after
plain-literal normalization (CsvwTestCasesSpec.cs:159-190).

Returns per-test triple-level precision/recall so the suite doubles as the
BASELINE.json P/R>=0.95 measurement.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Optional
from urllib.parse import urljoin

from ..csvw.convert import MODE_MINIMAL, MODE_STANDARD, PageConverter
from ..csvw.model import MetadataParseError, Table, TableGroup
from ..csvw.parse_meta import parse_metadata
from .turtle import TurtleParseError, _normalize_literal, parse_turtle

SUITE_DIR = "/root/reference/src/DataDock.CsvWeb.Tests/data/test-suite"
BASE = "http://www.w3.org/2013/csvw/tests/"


@dataclass
class TestOutcome:
    test_id: str
    kind: str           # ToRdfTest | ToRdfTestWithWarnings | NegativeRdfTest
    status: str         # pass | fail | error | skip
    detail: str = ""
    tp: int = 0         # matched triples (blank-node-insensitive best map)
    fp: int = 0         # emitted but not expected
    fn: int = 0         # expected but not emitted


def load_manifest(suite_dir: str = SUITE_DIR) -> list[dict]:
    with open(os.path.join(suite_dir, "manifest-rdf.jsonld"),
              encoding="utf-8-sig") as f:
        return json.load(f)["entries"]


def _read(suite_dir: str, rel: str) -> str:
    with open(os.path.join(suite_dir, rel), encoding="utf-8-sig",
              newline="") as f:
        return f.read()


def _exists(suite_dir: str, rel: str) -> bool:
    return os.path.isfile(os.path.join(suite_dir, rel))


def _rel_from_url(url: str) -> Optional[str]:
    if url.startswith(BASE):
        rel = url[len(BASE):]
        return rel.split("?")[0].split("#")[0]
    return None


def _resolver(suite_dir: str):
    def resolve_json(url: str) -> dict:
        rel = _rel_from_url(url)
        if rel is None or not _exists(suite_dir, rel):
            raise MetadataParseError(f"Cannot resolve {url}")
        return json.loads(_read(suite_dir, rel))
    return resolve_json


def metadata_candidates(entry: dict, suite_dir: str) -> list[str]:
    """Discovery candidates in the reference's order (Rdf/Converter.cs:
    141-207): Link header, then the W3C-hosted /.well-known/csvm template
    list ({+url}-metadata.json / csv-metadata.json / {+url}.json /
    csvm.json). Query components are stripped when deriving file paths."""
    action = entry["action"]  # {+url} templates INCLUDE the query component
    path = action.split("?")[0]
    out = []
    link = entry.get("httpLink")
    if link:
        m = re.search(r"<([^>]+)>", link)
        if m and ('rel="describedby"' in link or "csvm+json" in link
                  or "ld+json" in link):
            rel = _rel_from_url(urljoin(BASE + path, m.group(1)))
            if rel and _exists(suite_dir, rel):
                out.append(rel)
    for cand in (action + "-metadata.json",
                 urljoin(path, "csv-metadata.json"),
                 action + ".json",
                 urljoin(path, "csvm.json")):
        if "?" not in cand and _exists(suite_dir, cand) and cand not in out:
            out.append(cand)
    return out


def _table_texts(group: TableGroup, suite_dir: str) -> dict:
    texts = {}
    for t in group.tables:
        rel = _rel_from_url(t.url)
        if rel is None or not _exists(suite_dir, rel):
            raise MetadataParseError(f"Cannot resolve table url {t.url}")
        texts[t.url] = _read(suite_dir, rel)
    return texts


def run_entry(entry: dict, suite_dir: str = SUITE_DIR) -> tuple:
    """-> (triples, errors): convert one manifest entry with the kernel."""
    action = entry["action"]
    option = entry.get("option", {})
    mode = MODE_MINIMAL if option.get("minimal") else MODE_STANDARD
    resolver = _resolver(suite_dir)

    if action.endswith(".json"):
        meta_text = _read(suite_dir, action)
        group = parse_metadata(meta_text, BASE + action,
                               json_resolver=resolver)
    elif option.get("metadata"):
        meta_rel = option["metadata"]
        meta_text = _read(suite_dir, meta_rel)
        # ConvertWithLocalMetadata parses user metadata against the SOURCE
        # url (Rdf/Converter.cs:125-139)
        group = parse_metadata(meta_text, BASE + action,
                               json_resolver=resolver)
    else:
        group = None
        action_path = (BASE + action).split("?")[0]
        for meta_rel in metadata_candidates(entry, suite_dir):
            meta_text = _read(suite_dir, meta_rel)
            cand = parse_metadata(meta_text, BASE + meta_rel,
                                  json_resolver=resolver)
            # discovered metadata that does not reference the requested file
            # is ignored (warning); discovery continues down the candidates
            if any(t.url.split("?")[0] == action_path for t in cand.tables):
                group = cand
                break
        if group is None:
            group = TableGroup()
            group.tables.append(Table(url=BASE + action))

    texts = _table_texts(group, suite_dir)
    conv = PageConverter(mode=mode, uri_escaping="w3c")
    result = conv.convert_table_group(group, texts)
    return [t.astuple() for t in result.triples], result.errors


def _score(actual: list, expected: list) -> tuple[int, int, int]:
    """Triple-level tp/fp/fn under the best greedy blank-node mapping:
    ground triples are matched exactly; bnode-involving triples are matched
    by signature with labels erased (an upper-bound-tight approximation for
    the fixture-scale graphs here)."""
    from collections import Counter

    def erase(t):
        s, p, o, kind, dt, lang = _normalize_literal(t)
        s2 = "_:*" if s.startswith("_:") else s
        o2 = "_:*" if kind == "bnode" else o
        return (s2, p, o2, kind, dt, lang)

    # RDF graphs are SETS: dedupe per concrete label first (the reference's
    # handler pushes duplicate describes-triples into a set graph), then
    # compare the erased multisets
    ca = Counter(map(erase, set(map(tuple, actual))))
    ce = Counter(map(erase, set(map(tuple, expected))))
    tp = sum((ca & ce).values())
    fp = sum((ca - ce).values())
    fn = sum((ce - ca).values())
    return tp, fp, fn


def evaluate_entry(entry: dict, suite_dir: str = SUITE_DIR) -> TestOutcome:
    kind = entry["type"].split(":")[-1]
    tid = entry["id"].split("#")[-1]
    if entry.get("approval") != "rdft:Approved":
        return TestOutcome(tid, kind, "skip", "not approved")
    try:
        actual, errors = run_entry(entry, suite_dir)
    except NotImplementedError as ex:
        if kind == "NegativeRdfTest":
            return TestOutcome(tid, kind, "pass", "rejected (unsupported format)")
        return TestOutcome(tid, kind, "error", f"NotImplemented: {ex}")
    except MetadataParseError as ex:
        # the one exception type that IS the converter's documented
        # rejection channel; anything else is a harness/kernel crash
        if kind == "NegativeRdfTest":
            return TestOutcome(tid, kind, "pass", "rejected")
        return TestOutcome(tid, kind, "error", f"{type(ex).__name__}: {ex}")
    except Exception as ex:
        # review fix: a bare crash used to count as a vacuous negative-test
        # 'pass', hiding real regressions behind 58 green rows
        return TestOutcome(tid, kind, "error", f"{type(ex).__name__}: {ex}")

    if kind == "NegativeRdfTest":
        # negative tests assert a non-empty error list
        # (CsvwTestCasesSpec.cs:192-216)
        if errors:
            return TestOutcome(tid, kind, "pass", "errors reported")
        return TestOutcome(tid, kind, "fail", "no errors reported")

    result_rel = entry.get("result")
    if not result_rel:
        return TestOutcome(tid, kind, "skip", "no result graph")
    try:
        expected = parse_turtle(_read(suite_dir, result_rel),
                                base=BASE + result_rel)
    except TurtleParseError as ex:
        return TestOutcome(tid, kind, "skip", f"golden unparseable: {ex}")
    tp, fp, fn = _score(actual, expected)
    # pass/fail is decided by EXACT bijective bnode isomorphism (review
    # fix: the label-erased _score is an upper bound that can call two
    # non-isomorphic bnode structures equal; it still supplies the
    # triple-level tp/fp/fn used for the P/R metric)
    from .turtle import _normalize_literal, graphs_isomorphic
    na = list({_normalize_literal(tuple(t)) for t in map(tuple, actual)})
    ne = list({_normalize_literal(tuple(t)) for t in map(tuple, expected)})
    iso = graphs_isomorphic(na, ne)
    status = "pass" if (iso and not errors) else "fail"
    return TestOutcome(tid, kind, status, f"tp={tp} fp={fp} fn={fn}",
                       tp=tp, fp=fp, fn=fn)


def run_suite(suite_dir: str = SUITE_DIR, only: Optional[set] = None) -> dict:
    outcomes = []
    for entry in load_manifest(suite_dir):
        tid = entry["id"].split("#")[-1]
        if only and tid not in only:
            continue
        outcomes.append(evaluate_entry(entry, suite_dir))
    positives = [o for o in outcomes if o.kind != "NegativeRdfTest"
                 and o.status in ("pass", "fail", "error")]
    tp = sum(o.tp for o in positives)
    fp = sum(o.fp for o in positives)
    fn = sum(o.fn for o in positives)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    return {
        "outcomes": outcomes,
        "n_pass": sum(o.status == "pass" for o in outcomes),
        "n_fail": sum(o.status == "fail" for o in outcomes),
        "n_error": sum(o.status == "error" for o in outcomes),
        "n_skip": sum(o.status == "skip" for o in outcomes),
        "precision": precision,
        "recall": recall,
    }
