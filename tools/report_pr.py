"""Emit the BASELINE.json headline metric as a standalone artifact:
triple-level precision/recall vs the W3C CSVW csv2rdf test-suite expected
graphs (270 manifest entries from the reference's fixture corpus).

Writes PR_REPORT.json at the repo root and prints it.

Usage: python tools/report_pr.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csvweb_spark.testing.w3c import SUITE_DIR, run_suite


def main():
    if not os.path.isdir(SUITE_DIR):
        print(json.dumps({"error": f"suite fixtures not found: {SUITE_DIR}"}))
        return 1
    r = run_suite(SUITE_DIR)
    report = {
        "metric": "w3c_csvw_triple_precision_recall",
        "precision": round(r["precision"], 6),
        "recall": round(r["recall"], 6),
        "target": 0.95,
        "n_tests": r["n_pass"] + r["n_fail"] + r["n_error"],
        "n_pass": r["n_pass"],
        "n_fail": r["n_fail"],
        "n_error": r["n_error"],
        "suite": SUITE_DIR,
        "failures": [o.test_id for o in r["outcomes"]
                     if o.status in ("fail", "error")],
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PR_REPORT.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0 if (report["precision"] >= 0.95 and report["recall"] >= 0.95) else 1


if __name__ == "__main__":
    sys.exit(main())
