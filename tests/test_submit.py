"""The ``spark-submit --py-files`` deployment shape (north rule: the
job "runs via spark-submit --py-files on a multi-executor cluster").

Packages llm_scraper_spark as a zip, launches scripts/submit_crawl.py
through the real spark-submit binary with --py-files, and checks the
round manifests it prints.  The script sets no master and no driver-JVM
options in code, so the submit flags actually take effect — that is the
contract this test pins.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit")
    else None
)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_submit_crawl_via_py_files(tmp_path):
    pkg_zip = tmp_path / "llm_scraper_spark.zip"
    pkg_root = os.path.join(REPO, "llm_scraper_spark")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    workdir = tmp_path / "crawl"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--driver-memory",
            "4g",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            str(pkg_zip),
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            "--seeds",
            "2000",
            "--rounds",
            "1",
            "--workdir",
            str(workdir),
        ],
        capture_output=True,
        text=True,
        # run from a scratch cwd so the import must come from the
        # --py-files zip, not the repo checkout
        cwd=str(tmp_path),
        timeout=600,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [json.loads(ln) for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout
    summary = lines[-1]
    assert summary["rounds"] == 1
    assert summary["fetched"] > 0
    assert summary["seen_delta"] >= summary["fetched"] > 0
    # the round manifest committed on disk — the resume contract's anchor
    assert (workdir / "manifests" / "r0.json").exists()
