"""N-vs-4N scaling evidence (BASELINE.md §3 protocol).

Runs bench.py in fresh processes at local[8] (N) and local[32] (4N) on the
same input, computes throughput scaling efficiency, and writes
BENCH/BASELINE.md. One JVM per parallelism level — cluster-size analogue
in the sandbox, per the north_rule's two-cluster-size criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n, four_n = 8, 32
    a = run_level(n, sf_dir)
    b = run_level(four_n, sf_dir)
    # throughput on the raw-data-touching headline
    thr_a, thr_b = a["docs_per_sec"], b["docs_per_sec"]
    eff = round((thr_b / thr_a) / (four_n / n), 3)
    result = {
        "sf": a["sf"],
        "docs": a["docs"],
        "N_cores": n,
        "4N_cores": four_n,
        "docs_per_sec_N": thr_a,
        "docs_per_sec_4N": thr_b,
        "scaling_efficiency": eff,
        "queries_N": a["queries"],
        "queries_4N": b["queries"],
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH baseline — two-parallelism scaling evidence

Protocol (BASELINE.md §3): same deterministic input, same configs, one
fresh JVM per level; per-query times are medians of 3 runs.

| | N = local[{n}] | 4N = local[{four_n}] |
| --- | --- | --- |
| docs/sec (tier cascade) | {thr_a} | {thr_b} |
"""
            + "".join(
                f"| {q} (sec) | {a['queries'][q]} | {b['queries'][q]} |\n"
                for q in a["queries"]
            )
            + f"""
- input: synthetic web_pages sf={a['sf']} ({a['docs']} docs)
- **scaling efficiency (docs/sec): {eff}** (target ≥ 0.8, north_rule)
- raw JSON: see BENCH/scaling.json
"""
        )
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
