"""Deployment smoke: the spark-submit --py-files entry point must run the
end-to-end KG job from the packaged zip (north_rule deployment shape) and
resume committed buckets on re-run."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None or not os.path.isdir(SF_DIR),
    reason="spark-submit or sf0.001 test data unavailable")


def _run(out_dir):
    env = {**os.environ, "SPARK_MASTER": "local[4]"}
    r = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "submit.sh"), SF_DIR, out_dir],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_submit_py_files_end_to_end_and_resume(tmp_path):
    out = str(tmp_path / "kg")
    first = _run(out)
    assert first["job"] == "kg_construct"
    assert first["triples_committed"] > 0
    assert first["entities_committed"] > 0
    assert os.path.isdir(os.path.join(out, "triples", "_manifests"))
    # resume: identical input, all buckets already committed
    second = _run(out)
    assert second["triples_committed"] == 0
    assert second["buckets_committed"] == 0
