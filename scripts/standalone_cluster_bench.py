"""N-vs-4N scaling on a REAL Spark standalone cluster — the strongest
sandbox form of the north_rule's two-cluster-size criterion.

Unlike multi_executor_bench.py (independent driver JVMs + manual
partial-merge), this starts an actual cluster manager on the box —
1 Master + 4 Workers (8 cores, 7g each) as separate JVM processes — and
submits ONE application via spark-submit at two sizes:

- level N : ``spark.cores.max=8``  → the scheduler grants 1 executor
- level 4N: ``spark.cores.max=32`` → 4 executors, 8 cores each

The job is the engine's 1m rollup cascade over 1,000,000,000 synthetic
points (same layout as the multi-executor bench: time-contiguous per id,
the batch-clustered arrival plans/job.py guarantees). The groupBy's
exchange between executor JVMs is Spark's real shuffle (netty block
transfer), not a driver-side merge — exactly what a 1000-executor
cluster does, minus the network. A pure-ALU control (xxhash64 +
bit_xor reduce, near-zero state) measures the host's process-scaling
ceiling in the same harness.

Timing: warm-up run first (codegen JIT; executors are long-lived at
steady state), then the timed run, inside one long-lived app — submit/
scheduler startup excluded at both levels. min over reps (default 3),
full spread published. Writes BENCH/SCALING_STANDALONE.md and merges a
``standalone_cluster`` block into BENCH/scaling.json.
"""

from __future__ import annotations

import json
import os
import signal
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
POINTS = int(os.environ.get("BEAMIUM_BENCH_POINTS", str(1_000_000_000)))
REPS = int(os.environ.get("BEAMIUM_BENCH_REPS", "3"))
N_WORKERS = 4
WORKER_CORES = 8

_DRIVER = """\
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from beamium_spark.operators.rollup import rollup_cascade, rollup_tier

points, reps, want_cores = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = SparkSession.builder.appName("standalone-scaling").getOrCreate()
sc = spark.sparkContext
# defaultParallelism trails executor registration — wait for the full
# grant so level N doesn't run under-provisioned (and 4N over-counts)
_t0 = time.monotonic()
while sc.defaultParallelism < want_cores and time.monotonic() - _t0 < 120:
    time.sleep(0.5)
cores = sc.defaultParallelism
assert cores == want_cores, f"granted {cores} cores, wanted {want_cores}"
base = 1735689600
pps = max(1, points // 259200)  # ~3 days of data


def cascade():
    pts = spark.range(0, points, 1, 256).select(
        (F.col("id") % 64).cast("int").alias("bucket"),
        F.concat(F.lit("m"), (F.col("id") % 4).cast("string")).alias("metric"),
        F.timestamp_seconds(
            F.lit(base) + (F.col("id") / F.lit(pps)).cast("long")
        ).alias("ts"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )
    t = rollup_cascade(rollup_tier(pts, "1 minute"), "1 hour")
    return t.agg(
        F.count(F.lit(1)).alias("rows"), F.sum("sum_value").alias("s")
    ).collect()[0]


def alu():
    # chained hashing: enough sustained ALU work per row that the run
    # lasts ~10s at level N — a sub-second control only measures the
    # task-scheduling floor, not the host's compute-scaling ceiling
    h = F.col("id")
    for _ in range(16):
        h = F.xxhash64(h)
    return (
        spark.range(0, points, 1, 256)
        .select(h.alias("h"))
        .agg(F.bit_xor("h"))
        .collect()
    )


row = cascade()  # warm-up: codegen JIT + executor spin-up
casc_samples = []
for _ in range(reps):
    t0 = time.monotonic()
    cascade()
    casc_samples.append(round(time.monotonic() - t0, 3))
alu()  # warm-up
alu_samples = []
for _ in range(reps):
    t0 = time.monotonic()
    alu()
    alu_samples.append(round(time.monotonic() - t0, 3))
print(
    "RESULT "
    + json.dumps(
        {
            "cores": cores,
            "tier_rows": int(row["rows"]),
            "tier_sum": float(row["s"]),
            "cascade_samples": casc_samples,
            "alu_samples": alu_samples,
        }
    )
)
spark.stop()
"""


def _spawn(cls: str, *args: str, log: str) -> subprocess.Popen:
    env = dict(os.environ)
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    return subprocess.Popen(
        [os.path.join(SPARK_HOME, "bin", "spark-class"), cls, *args],
        stdout=open(log, "w"),
        stderr=subprocess.STDOUT,
        env=env,
        preexec_fn=os.setsid,
    )


def _wait_for(log: str, needle: str, timeout: float = 60.0) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if os.path.exists(log) and needle in open(log, errors="ignore").read():
            return
        time.sleep(0.5)
    raise RuntimeError(f"{needle!r} not seen in {log} within {timeout}s")


def _submit(cores_max: int, workdir: str) -> dict:
    driver_py = os.path.join(workdir, "driver.py")
    with open(driver_py, "w") as f:
        f.write(_DRIVER)
    # ship the library the production way: --py-files zip
    import zipfile

    zpath = os.path.join(workdir, "beamium_spark.zip")
    pkg = os.path.join(REPO, "beamium_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _d, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.join("beamium_spark",
                                               os.path.relpath(full, pkg)))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            os.path.join(SPARK_HOME, "bin", "spark-submit"),
            "--master", MASTER_URL,
            "--deploy-mode", "client",
            "--driver-memory", "4g",
            "--py-files", zpath,
            "--conf", f"spark.cores.max={cores_max}",
            "--conf", f"spark.executor.cores={WORKER_CORES}",
            "--conf", "spark.executor.memory=6g",
            "--conf", "spark.sql.shuffle.partitions=64",
            "--conf", "spark.sql.session.timeZone=UTC",
            driver_py, str(POINTS), str(REPS), str(cores_max),
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=workdir,
        timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"submit failed:\n{proc.stderr[-4000:]}")
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line:\n{proc.stdout[-2000:]}")


def main() -> None:
    work = tempfile.mkdtemp(prefix="standalone_bench_")
    daemons: list[subprocess.Popen] = []
    try:
        mlog = os.path.join(work, "master.log")
        daemons.append(
            _spawn(
                "org.apache.spark.deploy.master.Master",
                "--host", "127.0.0.1", "--port", "7077",
                "--webui-port", "18080",
                log=mlog,
            )
        )
        _wait_for(mlog, "I have been elected leader")
        for i in range(N_WORKERS):
            wlog = os.path.join(work, f"worker{i}.log")
            daemons.append(
                _spawn(
                    "org.apache.spark.deploy.worker.Worker",
                    "--cores", str(WORKER_CORES),
                    "--memory", "7g",
                    "--webui-port", str(18081 + i),
                    "--work-dir", os.path.join(work, f"work{i}"),
                    MASTER_URL,
                    log=wlog,
                )
            )
        for i in range(N_WORKERS):
            _wait_for(os.path.join(work, f"worker{i}.log"),
                      "Successfully registered with master")

        res_n = _submit(WORKER_CORES, work)  # 1 executor
        res_4n = _submit(WORKER_CORES * N_WORKERS, work)  # 4 executors
    finally:
        for p in daemons:
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGTERM)
            except ProcessLookupError:
                pass

    assert res_n["tier_rows"] == res_4n["tier_rows"], (res_n, res_4n)
    assert res_n["tier_sum"] == res_4n["tier_sum"], (res_n, res_4n)
    c_n, c_4n = min(res_n["cascade_samples"]), min(res_4n["cascade_samples"])
    a_n, a_4n = min(res_n["alu_samples"]), min(res_4n["alu_samples"])
    eff = round(c_n / (4 * c_4n), 3)
    alu_eff = round(a_n / (4 * a_4n), 3)
    norm = round(eff / alu_eff, 3) if alu_eff else None
    result = {
        "mode": "standalone cluster (1 Master + 4 Workers, one app via "
                "spark-submit --py-files; real inter-executor shuffle)",
        "points_total": POINTS,
        "reps": REPS,
        "stat": "min",
        "N": {"executors": 1, "cores": res_n["cores"],
              "cascade_samples": res_n["cascade_samples"],
              "alu_samples": res_n["alu_samples"]},
        "4N": {"executors": N_WORKERS, "cores": res_4n["cores"],
               "cascade_samples": res_4n["cascade_samples"],
               "alu_samples": res_4n["alu_samples"]},
        "cascade_N_sec": c_n,
        "cascade_4N_sec": c_4n,
        "tier_rows": res_n["tier_rows"],
        "scaling_efficiency": eff,
        "alu_ceiling_efficiency": alu_eff,
        "ceiling_normalized_efficiency": norm,
    }
    print(json.dumps(result, indent=2))

    sj = os.path.join(REPO, "BENCH", "scaling.json")
    data = json.load(open(sj)) if os.path.exists(sj) else {}
    data["standalone_cluster"] = result
    hist = data.setdefault("standalone_cluster_history", [])
    hist.append({"eff": eff, "alu_eff": alu_eff, "norm": norm})
    json.dump(data, open(sj, "w"), indent=2)

    md = os.path.join(REPO, "BENCH", "SCALING_STANDALONE.md")
    with open(md, "w") as f:
        f.write(f"""# Standalone-cluster scaling (one app, real executors)

The cluster-faithful form executed LITERALLY: a Spark standalone Master
and {N_WORKERS} Workers ({WORKER_CORES} cores / 7g each) run as separate JVM
daemons on this box, and ONE application is submitted twice via
`spark-submit --py-files beamium_spark.zip` (the production deployment
path):

- level N : `spark.cores.max={WORKER_CORES}` → the scheduler grants 1 executor
- level 4N: `spark.cores.max={WORKER_CORES * N_WORKERS}` → 4 executors, 8 cores each

The job is the engine's 1m→1h cascade over {POINTS:,} synthetic points
(time-contiguous per id — the batch-clustered arrival the production
job guarantees). The partial→final exchange between executors is
Spark's OWN shuffle (netty block transfer between executor JVMs), not a
driver-side merge. Warm-up run first, then min of {REPS} timed reps in
the same long-lived app.

| | N = 1 executor | 4N = 4 executors |
| --- | --- | --- |
| cascade (min of {REPS}) | {c_n:.2f}s | {c_4n:.2f}s |
| per-rep spread | {res_n['cascade_samples']} | {res_4n['cascade_samples']} |
| ALU ceiling control (min of {REPS}) | {a_n:.2f}s | {a_4n:.2f}s |
| ALU control spread | {res_n['alu_samples']} | {res_4n['alu_samples']} |

- merged 1h tier identical at both levels: {res_n['tier_rows']} rows,
  checksum-equal sums
- **scaling efficiency (cascade): {eff}** (north_rule target ≥ 0.8)
- host ALU process-scaling ceiling in the same harness: {alu_eff};
  ceiling-normalized cascade efficiency: {norm}
- see BENCH/SCALING_EXECUTORS.md for the five-run consecutive records
  of the sharded multi-process form and BENCH/BASELINE.md for the
  thread-packed single-JVM (pessimistic) form.
""")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
