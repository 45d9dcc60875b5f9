"""The north-rule deployment clause, executed: the engine runs via
``spark-submit --py-files beamium_spark.zip driver.py`` — the library is
shipped as a zip (no install on the cluster), the driver script imports
it from the py-files path and runs a real rollup, and the subprocess's
stdout carries the computed result back for assertion.

Mirrors how the reference ships one self-contained binary
(/root/reference/src/main.rs:47-104): one artifact, no site-packages
assumption on workers. ``--master local[2]`` stands in for the cluster
manager; the submit path (SparkSubmit JVM entry, PYTHONPATH injection of
py-files into driver AND executors) is identical on YARN/k8s.
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """\
import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# resolved from --py-files, NOT from a repo checkout on sys.path
import beamium_spark
from beamium_spark.operators.rollup import rollup_cascade, rollup_tier

spark = (
    SparkSession.builder.appName("submit-smoke")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
assert "beamium_spark" in beamium_spark.__file__, beamium_spark.__file__

t0 = dt.datetime(2025, 1, 1)
pts = spark.createDataFrame(
    [(0, "doc_count", t0 + dt.timedelta(minutes=m), 1.0) for m in range(120)],
    "bucket int, metric string, ts timestamp, value double",
)
t1h = rollup_cascade(rollup_tier(pts, "1 minute"), "1 hour")
rows = sorted(t1h.collect(), key=lambda r: r["window_start"])
print("SUBMIT_OK", len(rows), int(rows[0]["cnt"]), float(rows[0]["sum_value"]))
spark.stop()
"""


def _spark_submit_bin() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_py_files_end_to_end(tmp_path):
    submit = _spark_submit_bin()
    if not os.path.exists(submit):
        pytest.skip("no spark-submit binary available")

    zpath = tmp_path / "beamium_spark.zip"
    pkg_dir = os.path.join(REPO, "beamium_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(
                        full,
                        os.path.join(
                            "beamium_spark", os.path.relpath(full, pkg_dir)
                        ),
                    )

    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)

    env = dict(os.environ)
    # the driver must see beamium_spark ONLY through --py-files: scrub any
    # repo path the test runner injected
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--driver-memory", "2g",
            "--py-files", str(zpath),
            str(driver),
        ],
        cwd=str(tmp_path),  # NOT the repo: imports can't fall back to ./beamium_spark
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    ok = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_OK")]
    # 120 minutes of one point/min -> two 1h windows of cnt=60, sum=60.0
    assert ok == ["SUBMIT_OK 2 60 60.0"], proc.stdout[-2000:]
