"""Deterministic synthetic ``web_pages`` fixture generator.

Schema (authoritative: BASELINE.json ``input_hint`` / FIXTURES.md F-1):

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Properties engineered in (all seeded — zero wall-clock dependence):

- ~200 sites, zipf-skewed so one site holds >=30% of rows (hot url-bucket,
  exercises salting; cf. beamium's per-scraper fan-in which concentrates
  lines per source, /root/reference/src/scraper.rs:221-303).
- ~5% of rows are re-crawls of an earlier url at a later warc_ts, with
  **byte-identical html/text** — the end-to-end invariant the engine must
  preserve (BASELINE.json input_hint).
- warc_ts spans 3 days from 2025-01-01T00:00:00Z, bursty, with a forced
  >=17-minute silent gap for one site (exercises gap-fill) plus rows exactly
  on 1m/1h/1d window boundaries.
- html = b"<html><body>" + payload + b"</body></html>"; text = payload.
  Extraction is therefore expressible as a pure Spark column op and
  byte-exact. Payload length ~lognormal (median ~8 KiB, clipped 256 KiB).
- Edge rows: empty text, zero-length html, single-point series (site 199).

Generation is numpy-vectorized and written with pyarrow directly (no Spark),
so the DuckDB oracle and the Spark engine read the very same file bytes.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_SITES = 200
BASE_TS_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds
SPAN_US = 3 * 24 * 3600 * 1000000  # 3 days
LANGS = ["en", "de", "fr", "es", "zh", "other"]
LANG_P = [0.55, 0.12, 0.10, 0.08, 0.07, 0.08]
HOT_SITE_SHARE = 0.30
DUP_FRAC = 0.05
_POOL_BYTES = 8 * 1024 * 1024
_MAX_LEN = 256 * 1024
_PREFIX = b"<html><body>"
_SUFFIX = b"</body></html>"

FIXTURE_ROOT = os.environ.get(
    "BEAMIUM_FIXTURE_ROOT", "/root/repo/.fixtures/web_pages"
)


def rows_for_sf(sf: float) -> int:
    """sf0.001→6k (tiny+), sf0.01→60k (oracle), sf0.1→600k (bench)."""
    return max(2000, int(round(sf * 6_000_000)))


def web_pages_path(sf: float, root: str = FIXTURE_ROOT) -> str:
    return os.path.join(root, f"sf{sf:g}")


def _site_probs() -> np.ndarray:
    w = np.arange(1, N_SITES + 1, dtype=np.float64) ** -1.2
    w /= w.sum()
    # boost site 0 to hold >=30% of mass, renormalize the rest
    w *= (1.0 - HOT_SITE_SHARE) / (1.0 - w[0])
    w[0] = HOT_SITE_SHARE
    return w / w.sum()


def _payload_pool(rng: np.random.Generator) -> bytes:
    """Deterministic ASCII word-soup pool; slices of it are page payloads."""
    alphabet = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz      ", dtype=np.uint8)
    idx = rng.integers(0, len(alphabet), size=_POOL_BYTES)
    return alphabet[idx].tobytes()


def generate_web_pages(sf: float, out_dir: str) -> str:
    n = rows_for_sf(sf)
    rng = np.random.Generator(np.random.PCG64(SEED))
    pool = _payload_pool(rng)

    # --- unique pages -----------------------------------------------------
    n_unique = int(n * (1.0 - DUP_FRAC))
    site = rng.choice(N_SITES, size=n_unique, p=_site_probs()).astype(np.int32)
    site[site == 199] = 198  # reserve site 199 for the single-point series
    path = np.arange(n_unique, dtype=np.int64)  # unique path per page
    # lengths: lognormal median 8 KiB, sigma 1 → clipped [16, 256 KiB]
    length = np.clip(
        rng.lognormal(mean=np.log(8192.0), sigma=1.0, size=n_unique), 16, _MAX_LEN
    ).astype(np.int64)
    offset = rng.integers(0, _POOL_BYTES - _MAX_LEN, size=n_unique)
    lang_idx = rng.choice(len(LANGS), size=n_unique, p=LANG_P)

    # --- row stream: first crawls + 5% re-crawls --------------------------
    n_dup = n - n_unique
    dup_src = rng.integers(0, n_unique, size=n_dup)
    url_idx = np.concatenate([np.arange(n_unique), dup_src])

    # --- timestamps: bursty mixture over 3 days ---------------------------
    u = rng.random(n)
    burst = rng.integers(0, 4, size=n)
    centers = np.array([0.15, 0.40, 0.65, 0.90]) * SPAN_US
    widths = np.array([0.04, 0.08, 0.03, 0.06]) * SPAN_US
    ts_off = np.where(
        rng.random(n) < 0.5,
        (u * SPAN_US),
        np.clip(
            centers[burst] + rng.standard_normal(n) * widths[burst], 0, SPAN_US - 1
        ),
    ).astype(np.int64)
    ts = BASE_TS_US + ts_off
    # re-crawls happen strictly later than the original crawl
    ts[n_unique:] = np.maximum(ts[n_unique:], ts[dup_src] + 60_000_000)
    ts = np.minimum(ts, BASE_TS_US + SPAN_US - 1)

    # forced silent gap >=17 min for site 3 in hour 2 of day 1
    gap_start = BASE_TS_US + 2 * 3600 * 1000000
    gap_end = gap_start + 17 * 60 * 1000000
    row_site = site[url_idx]
    in_gap = (row_site == 3) & (ts >= gap_start) & (ts < gap_end)
    ts[in_gap] = gap_end

    order = np.argsort(ts, kind="stable")
    url_idx, ts = url_idx[order], ts[order]

    # --- materialize columns (bytes built from pool slices) ---------------
    sites_s = np.char.zfill(site.astype("U4"), 4)

    def mk_url(i: int) -> str:
        return f"https://site{sites_s[i]}.example/p{path[i]}"

    urls_u = [mk_url(i) for i in range(n_unique)]
    texts_u = [
        pool[offset[i] : offset[i] + length[i]].decode("ascii")
        for i in range(n_unique)
    ]
    langs_u = [LANGS[j] for j in lang_idx]

    # --- edge rows --------------------------------------------------------
    extra = [
        # empty text (wrapper-only html)
        ("https://site0198.example/empty", BASE_TS_US + 1000, "", "en"),
        # zero-length html
        ("https://site0198.example/zero", BASE_TS_US + 2000, None, "en"),
        # exact 1d/1h/1m boundary
        ("https://site0005.example/day", BASE_TS_US + 24 * 3600 * 1000000, "day boundary page", "en"),
        # exact 1h/1m boundary
        ("https://site0005.example/hour", BASE_TS_US + 5 * 3600 * 1000000, "hour boundary page", "de"),
        # single-point series: the only site-199 row
        ("https://site0199.example/lonely", BASE_TS_US + 7 * 3600 * 1000000, "single point", "fr"),
    ]

    os.makedirs(out_dir + ".tmp", exist_ok=True)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    # ~4k rows x ~26 KiB (html+text) ≈ 100 MiB per row group: row groups
    # are parquet's split unit — fat-binary tables need small row counts
    # per group or scan parallelism collapses to #groups. Likewise split
    # into many FILES (~20k rows ≈ 500 MB each): single-file local reads
    # contend in the filesystem layer and cap multi-core scan scaling
    # (measured 10s single-file vs 3.5s multi-file at local[32]).
    batch_rows = 4096
    # target ~32 files so every core gets splits even before row-group
    # subdivision; floor to a multiple of batch_rows for clean rotation
    rows_per_file = max(batch_rows, (n // 32 // batch_rows) * batch_rows)
    pre, suf = _PREFIX, _SUFFIX
    writer = None
    file_idx = 0
    for lo in range(0, n, batch_rows):
        if writer is None or (lo // rows_per_file) != ((lo - batch_rows) // rows_per_file):
            if writer is not None:
                writer.close()
            writer = pq.ParquetWriter(
                os.path.join(out_dir + ".tmp", f"part-{file_idx:05d}.parquet"),
                schema,
                compression="snappy",
            )
            file_idx += 1
        hi = min(lo + batch_rows, n)
        idx = url_idx[lo:hi]
        cols_url = [urls_u[i] for i in idx]
        cols_text = [texts_u[i] for i in idx]
        cols_html = [pre + t.encode("ascii") + suf for t in cols_text]
        cols_lang = [langs_u[i] for i in idx]
        writer.write_table(
            pa.table(
                {
                    "url": cols_url,
                    "warc_ts": pa.array(ts[lo:hi], type=pa.timestamp("us")),
                    "html": cols_html,
                    "text": cols_text,
                    "lang": cols_lang,
                },
                schema=schema,
            )
        )
    ex_html = [
        (pre + t.encode("ascii") + suf) if t is not None else b"" for _, _, t, _ in extra
    ]
    writer.write_table(
        pa.table(
            {
                "url": [e[0] for e in extra],
                "warc_ts": pa.array(
                    np.array([e[1] for e in extra], dtype=np.int64),
                    type=pa.timestamp("us"),
                ),
                "html": ex_html,
                "text": [e[2] if e[2] is not None else "" for e in extra],
                "lang": [e[3] for e in extra],
            },
            schema=schema,
        )
    )
    writer.close()
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.rename(out_dir + ".tmp", out_dir)
    return out_dir


def ensure_web_pages(sf: float, root: str = FIXTURE_ROOT) -> str:
    """Generate-once cache; returns the parquet directory path."""
    out = web_pages_path(sf, root)
    if os.path.isdir(out) and any(
        f.endswith(".parquet") for f in os.listdir(out)
    ):
        return out
    os.makedirs(root, exist_ok=True)
    return generate_web_pages(sf, out)


# ---------------------------------------------------------------------------
# Prometheus exposition text fixture (the scrape-body path)
# ---------------------------------------------------------------------------

PROM_FIXTURE_ROOT = os.environ.get(
    "BEAMIUM_PROM_FIXTURE_ROOT", "/root/repo/.fixtures/prom_text"
)

# the batch-constant scrape time (µs) stamped on ts-less lines
# (reference: one `now` per scrape pass, src/lib/transcompiler.rs:16-22)
PROM_NOW_US = 1735689600123456

# golden-vector edge lines, mirroring the reference's inline tests
# (src/lib/transcompiler.rs:111-195, src/lib/mod.rs:103-173): ±Inf/nan
# skips, comment/blank skips, URL-encoding of %, space and +, missing
# timestamps, multi-label lines, malformed label blocks.
_PROM_EDGE_LINES = [
    '# HELP http_requests_total Total requests.',
    '# TYPE http_requests_total counter',
    '',
    'f{job_id="123"} +Inf',
    'f{job_id="123"} -Inf',
    'f{job_id="123"} nan',
    'f{job_id="123"} NaN',
    'f{job_id="1%3"} 1',
    'f{job_id="1 3"} 1',
    'f{job_id="1+3"} 1',
    'metric with space 1',
    'bare_token_no_value',
    'unclosed{job_id="123" 4',
    'no_ts_metric 42.5',
    'with_ts_metric 7 1735689660000',
    'neg_value{env="prod",dc="gra+1"} -3.25 1735689720000',
    'multi_label{a="x",b="y y",c="z%"} 0.5 1735689780000',
    'http_requests_total{method="GET",path="/api/v1"} 1027 1735689840000',
    'http_requests_total{method="POST",path="/api v2"} 3 1735689840000',
    'dotted.metric:name 9 1735689900000',
]


def generate_prom_text(out_path: str, n_series: int = 8, n_minutes: int = 10) -> str:
    """Deterministic Prometheus exposition text: the golden-vector edge
    lines above plus a body of counter samples across ``n_minutes`` minutes
    (several series, some ts-less so the batch `now` path aggregates too).
    Plain-python string build (tiny file; the scale path is many files)."""
    lines = list(_PROM_EDGE_LINES)
    base_ms = 1735689600000  # 2025-01-01T00:00:00Z
    for s in range(n_series):
        for m in range(n_minutes):
            for k in range(1 + (s + m) % 3):
                ts_ms = base_ms + m * 60000 + k * 7000 + s * 11000 % 53000
                val = round((s + 1) * 10 + m * 0.5 + k * 0.125, 6)
                if (s + m + k) % 7 == 0:
                    lines.append(f'series_{s}{{shard="{s % 4}"}} {val}')
                else:
                    lines.append(f'series_{s}{{shard="{s % 4}"}} {val} {ts_ms}')
    body = "\n".join(lines) + "\n"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(body)
    os.replace(tmp, out_path)  # the reference's .tmp→rename atomicity
    return out_path


def ensure_prom_text(root: str = PROM_FIXTURE_ROOT) -> str:
    out = os.path.join(root, "scrape-1735689600123456-0.metrics")
    if os.path.isfile(out):
        return out
    return generate_prom_text(out)


JSONL_FIXTURE_ROOT = os.environ.get(
    "BEAMIUM_JSONL_FIXTURE_ROOT", "/root/repo/.fixtures/jsonl_docs"
)


def ensure_jsonl_docs(sf_dir: str, root: str = JSONL_FIXTURE_ROOT) -> str:
    """Deterministic JSONL rendering of ``<sf_dir>/documents.parquet`` —
    the fixture for the JSONL-ingest gate. Written with plain
    pyarrow+json (no Spark, doc_id-sorted, ensure_ascii) so the bytes
    are reproducible and BOTH engines (Spark reader, DuckDB oracle) read
    the identical file. Self-caching like ensure_web_pages."""
    import json as _json

    import pyarrow.parquet as _pq

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(root, tag)
    out = os.path.join(out_dir, "docs.jsonl")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    t = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    ).to_pylist()
    t.sort(key=lambda r: r["doc_id"])
    tmp = out + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        for r in t:
            fh.write(_json.dumps(r, ensure_ascii=True, sort_keys=True))
            fh.write("\n")
    os.replace(tmp, out)
    return out
