"""The packaged-deployment path: spark-submit --py-files saber_spark.zip.

The north_rule's delivery shape is "runs via spark-submit --py-files on
multi-executor clusters" (BASELINE.json). This test runs it for real:
zip the package, launch ``examples/submit_smoke.py`` through the actual
``spark-submit`` launcher in a fresh JVM with an EMPTY PYTHONPATH and a
neutral cwd, and require that

- the job imported ``saber_spark`` from the zip (not the checkout),
- the streamed windowed aggregate committed rows through the
  exactly-once sink, and
- the job's internal batch-parity check found zero mismatches.
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
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("no spark-submit launcher found")


def _build_zip(dest_dir: str) -> str:
    zip_path = os.path.join(dest_dir, "saber_spark.zip")
    src = os.path.join(REPO, "saber_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return zip_path


def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = _build_zip(str(tmp_path))
    work_dir = str(tmp_path / "work")
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # the zip must be the ONLY way to the package
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            os.path.join(REPO, "examples", "submit_smoke.py"),
            "--sf-dir",
            SF_DIR,
            "--work-dir",
            work_dir,
        ],
        cwd=str(tmp_path),  # neutral cwd: the checkout is not importable
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-4000:]}"
    lines = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_SMOKE ")]
    assert lines, f"no SUBMIT_SMOKE line in stdout:\n{proc.stdout[-4000:]}"
    report = json.loads(lines[-1].removeprefix("SUBMIT_SMOKE "))
    # the package must resolve from inside the zip (…/saber_spark.zip/…),
    # proving --py-files carried the engine, not the repo checkout
    assert ".zip" in report["pkg"], report["pkg"]
    assert report["rows"] > 0
    assert report["mismatches"] == 0
    assert report["sum_len_total"] > 0
