"""Local stand-in for the driver's correctness gate.

Runs each ``queries()`` entry at sf0.01 on Spark and its ``oracle_sql()``
in DuckDB over the same parquet tables, then compares row counts, column
sets, and values (columns sorted by name, rows sorted by all columns,
floats compared to 9 significant decimals — mirroring the driver's
value-hash check closely enough to catch typing/rounding drift).

Usage:  python scripts/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(val):
    import decimal

    if val is None:
        return None
    if isinstance(val, bool):
        return val
    if isinstance(val, decimal.Decimal):
        val = float(val)
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # driver-style engine-neutral float folding
        return float(f"{val:.9g}")
    if isinstance(val, int):
        return int(val)
    return str(val)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from beamium_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="check-correctness")
    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SPARK-ERROR {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:28s} rows={len(s_rows):>8} (no oracle)")
            continue
        try:
            res = con.sql(sql)
            o_cols = list(res.columns)
            o_rows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE-ERROR {e}")
            failures += 1
            continue
        sc, srows = _canon_rows(s_cols, s_rows)
        oc, orows = _canon_rows(o_cols, o_rows)
        rows_ok = len(srows) == len(orows)
        schema_ok = sc == oc
        hash_ok = srows == orows
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(
            f"{name:28s} {status}  rows={len(srows)}/{len(orows)} "
            f"schema={'Y' if schema_ok else 'N:' + str(sc) + ' vs ' + str(oc)} "
            f"hash={'Y' if hash_ok else 'N'}"
        )
        if not hash_ok and rows_ok and schema_ok:
            for a, b in zip(srows, orows):
                if a != b:
                    print(f"   spark : {a}\n   oracle: {b}")
                    break
        failures += 0 if (rows_ok and schema_ok and hash_ok) else 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
