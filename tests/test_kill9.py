"""True SIGKILL resumability: a separate driver process is killed -9 in
the middle of a run; a fresh run resumes from the manifest and the final
tiers equal an uninterrupted run (the DFO kill-anywhere guarantee,
reference README.md:6)."""

import os
import signal
import subprocess
import sys
import time

import pytest

from beamium_spark.plans.job import JobConf, RollupJob
from beamium_spark.sources.synth import ensure_web_pages

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from beamium_spark.session import get_spark
from beamium_spark.plans.job import JobConf, RollupJob
spark = get_spark(app_name="kill9-child", master="local[8]", shuffle_partitions=8)
job = RollupJob(spark, {pages!r}, {root!r}, JobConf(bucket_mode="site", write_blocks=False))
# chunk-at-a-time so the kill lands between commits
while job.pending_chunks():
    job.run(max_chunks=1)
    print("CHUNK_DONE", flush=True)
print("ALL_DONE", flush=True)
"""


def test_sigkill_mid_run_then_resume(spark, tmp_path):
    pages = ensure_web_pages(0.0003)
    root = str(tmp_path / "state")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD.format(repo=repo, pages=pages, root=root)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    # let it commit at least one chunk, then kill -9 mid-flight
    done = 0
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        line = child.stdout.readline()
        if not line:
            break
        if line.startswith("CHUNK_DONE"):
            done += 1
            if done >= 2:
                break
        if line.startswith("ALL_DONE"):  # pragma: no cover - too fast
            break
    os.kill(child.pid, signal.SIGKILL)
    child.wait()
    assert done >= 1, "child never committed a chunk before the kill"

    # resume in THIS process from the on-disk manifest
    job = RollupJob(spark, pages, root, JobConf(bucket_mode="site", write_blocks=False))
    remaining = job.pending_chunks()
    assert remaining, "kill landed after all work — rerun with more chunks"
    job.run()
    assert job.pending_chunks() == []

    # uninterrupted reference
    ref = RollupJob(
        spark, pages, str(tmp_path / "ref"),
        JobConf(bucket_mode="site", write_blocks=False),
    )
    ref.run()
    for tier in ("rollup_1m", "rollup_1h", "rollup_1d"):
        a, b = job.tier(tier), ref.tier(tier)
        cols = sorted(set(a.columns) & set(b.columns))
        assert a.select(cols).exceptAll(b.select(cols)).count() == 0
        assert b.select(cols).exceptAll(a.select(cols)).count() == 0
    assert pytest  # keep import
