"""W3C CSVW csv2rdf conformance suite (manifest-rdf, 270 entries).

BASELINE.json gate: triple-level precision/recall >= 0.95 against the
suite's expected graphs. The run also asserts a floor on whole-test passes
so regressions in individual features stay visible."""

import pytest

from csvweb_spark.testing.w3c import SUITE_DIR, run_suite
from tests.conftest import have_reference

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference fixture corpus not available")


@pytest.mark.w3c
def test_w3c_suite_precision_recall():
    r = run_suite(SUITE_DIR)
    # regenerate the P/R artifact from the ordinary test run (round-3
    # VERDICT item 10: the gate must not be able to rot between rounds -
    # every green pytest leaves a fresh PR_REPORT.json behind)
    from tools.report_pr import write_report
    report = write_report(r)
    assert report["n_tests"] == report["n_pass"] + report["n_fail"] \
        + report["n_error"]
    assert r["precision"] >= 0.999, f"precision {r['precision']:.4f}"
    assert r["recall"] >= 0.999, f"recall {r['recall']:.4f}"
    assert r["n_pass"] >= 268, (
        f"pass={r['n_pass']} fail={r['n_fail']} err={r['n_error']}: "
        + "; ".join(f"{o.test_id}:{o.status}" for o in r["outcomes"]
                    if o.status in ("fail", "error"))[:800])
    assert r["n_error"] == 0
