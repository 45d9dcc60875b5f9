"""Streaming near-dup ingest: drain-equals-batch, restart memory, retry
idempotence."""

import os
import time

from pyspark.sql import Row

from beamium_spark.streaming.dedup_stream import (
    dedup_batch_processor,
    start_dedup_stream,
)

FLUENT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)
NEAR = FLUENT.replace("warm", "cold")
OTHER = (
    "completely different content about spark shuffle partitioning and "
    "adaptive query execution at terabyte scale with skew salting"
)
FRESH = "fresh unseen text about gorilla xor compression of timestamps"


def _write_file(spark, path, rows):
    """One self-contained parquet FILE at ``path`` (the file source lists
    plain files, not writer output directories)."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows]).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(tmp, "out"))
    part = glob.glob(os.path.join(tmp, "out", "part-*.parquet"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)


def _dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("src", "kept", "bands", "ckpt")}
    os.makedirs(d["src"], exist_ok=True)
    return d


def _kept_ids(spark, kept_dir):
    return {r.doc_id for r in spark.read.parquet(kept_dir).collect()}


def test_stream_drains_and_dedups_across_files(spark, tmp_path):
    d = _dirs(tmp_path)
    _write_file(spark, os.path.join(d["src"], "f1.parquet"), [(1, FLUENT), (2, OTHER)])
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_file(spark, os.path.join(d["src"], "f2.parquet"), [(10, NEAR), (11, FRESH)])
    q = start_dedup_stream(
        spark, d["src"], d["kept"], d["bands"], d["ckpt"],
        num_hashes=64, bands=32,
    )
    q.awaitTermination(120)
    assert _kept_ids(spark, d["kept"]) == {1, 2, 11}  # 10 ≈ 1, dropped

    # restart with a third file: dups of batch-1 content still drop —
    # the band store, not stream state, carries the memory
    time.sleep(1.1)
    _write_file(
        spark,
        os.path.join(d["src"], "f3.parquet"),
        [(20, FLUENT), (21, "entirely new prose describing kll sketches and watermark semantics")],
    )
    q2 = start_dedup_stream(
        spark, d["src"], d["kept"], d["bands"], d["ckpt"],
        num_hashes=64, bands=32,
    )
    q2.awaitTermination(120)
    assert _kept_ids(spark, d["kept"]) == {1, 2, 11, 21}


def test_retried_epoch_is_idempotent(spark, tmp_path):
    d = _dirs(tmp_path)
    proc = dedup_batch_processor(d["kept"], d["bands"], num_hashes=64, bands=32)
    b0 = spark.createDataFrame([Row(doc_id=1, text=FLUENT), Row(doc_id=2, text=OTHER)])
    b1 = spark.createDataFrame([Row(doc_id=10, text=NEAR), Row(doc_id=11, text=FRESH)])
    proc(b0, 0)
    proc(b1, 1)
    assert _kept_ids(spark, d["kept"]) == {1, 2, 11}
    # replay epoch 1 (foreachBatch retry after a mid-write crash): the
    # decision must not see epoch 1's own bands, and the partitions
    # overwrite instead of duplicating
    proc(b1, 1)
    assert _kept_ids(spark, d["kept"]) == {1, 2, 11}
    bands = spark.read.parquet(d["bands"])
    assert bands.count() == bands.distinct().count()
    # kept rows are unique too
    kept = spark.read.parquet(d["kept"])
    assert kept.count() == 3


_KILL_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from beamium_spark.session import get_spark
from beamium_spark.streaming.dedup_stream import start_dedup_stream
spark = get_spark(app_name="dedup-kill-child", master="local[4]", shuffle_partitions=4)
q = start_dedup_stream(
    spark, {src!r}, {kept!r}, {bands!r}, {ckpt!r},
    max_files_per_trigger=1, num_hashes=64, bands=32,
)
import threading
def _beat():
    last = -1
    while True:
        p = q.lastProgress
        if p and p["batchId"] != last:
            last = p["batchId"]
            print("EPOCH_DONE", last, flush=True)
        import time as _t; _t.sleep(0.2)
threading.Thread(target=_beat, daemon=True).start()
q.awaitTermination()
print("ALL_DONE", flush=True)
"""


def test_sigkill_mid_stream_then_resume(spark, tmp_path):
    """A separate driver is SIGKILLed after its first epoch commits; a
    fresh run over the same checkpoint + band store drains the rest and
    the final kept set equals an uninterrupted run — the band store, not
    process memory, carries the dedup state."""
    import signal
    import subprocess
    import sys as _sys

    d = _dirs(tmp_path)
    files = [
        [(1, FLUENT), (2, OTHER)],
        [(10, NEAR), (11, FRESH)],
        [(20, FLUENT), (21, "completely novel words about checkpoint fences")],
    ]
    for i, rows in enumerate(files):
        _write_file(spark, os.path.join(d["src"], f"f{i}.parquet"), rows)
        os.utime(
            os.path.join(d["src"], f"f{i}.parquet"),
            (1700000000 + 100 * i, 1700000000 + 100 * i),
        )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = subprocess.Popen(
        [_sys.executable, "-c", _KILL_CHILD.format(
            repo=repo, src=d["src"], kept=d["kept"], bands=d["bands"],
            ckpt=d["ckpt"])],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        # own process group: the SIGKILL below must take the child's JVM
        # with it — killing only the python driver leaves the JVM briefly
        # alive to commit an in-flight microbatch against the checkpoint
        # the parent is about to resume (CONCURRENT_STREAM_LOG_UPDATE)
        start_new_session=True,
    )
    done = 0
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        line = child.stdout.readline()
        if not line:
            break
        if line.startswith("EPOCH_DONE"):
            done += 1
            if done >= 1:
                break
        if line.startswith("ALL_DONE"):
            break
    try:
        os.killpg(os.getpgid(child.pid), signal.SIGKILL)
    except ProcessLookupError:
        pass  # child (and its group) already gone — ALL_DONE path
    child.wait()
    assert done >= 1, "child never finished an epoch before the kill"

    # resume in THIS process: same checkpoint, same stores
    q = start_dedup_stream(
        spark, d["src"], d["kept"], d["bands"], d["ckpt"],
        max_files_per_trigger=1, num_hashes=64, bands=32,
    )
    q.awaitTermination(180)
    assert _kept_ids(spark, d["kept"]) == {1, 2, 11, 21}

    # uninterrupted reference run
    ref = {k: str(tmp_path / ("ref_" + k)) for k in ("kept", "bands", "ckpt")}
    q2 = start_dedup_stream(
        spark, d["src"], ref["kept"], ref["bands"], ref["ckpt"],
        max_files_per_trigger=1, num_hashes=64, bands=32,
    )
    q2.awaitTermination(180)
    assert _kept_ids(spark, ref["kept"]) == _kept_ids(spark, d["kept"])
