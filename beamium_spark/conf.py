"""Engine configuration: beamium's config surface, re-expressed.

The reference merges layered hjson/json/toml/yaml/ini files with env
interpolation (/root/reference/src/conf.rs:101-184, 569-690). The engine
is a library driven by ``spark-submit``, so config is one JSON/YAML file
(or dict) parsed into the dataclasses below. Preserved semantics:

- ``env:VAR`` label values resolve from the environment
  (src/conf.rs:588-602);
- ``BEAMIUM_LABEL_<name>`` env vars inject global labels
  (src/conf.rs:604-609);
- scraper fields: format (prometheus|sensision), period, metrics
  (whitelist regexes, src/conf.rs:228-233), labels;
- sink fields: url→table, selector (anchored class regex,
  src/conf.rs:329-336), ttl (default 1h, :350-359), size (default 1 GiB,
  :361-372), parallel (:374-377);
- parameters: batch-size 200 kB / batch-count 250 / scan-period 1s /
  backoff 500ms→1m ×1.5 ±0.3 (src/conf.rs:122-138).

Hot reload (src/main.rs:148-205) maps to "restart the job from
checkpoint": all state is in the manifest, so a config change is a stop +
rerun — the resume path replays only unforwarded chunks.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field


@dataclass
class ScraperConf:
    name: str = "scraper"
    format: str = "prometheus"  # or "sensision" (conf.rs:187-205)
    period_s: int = 60
    metrics: list[str] = field(default_factory=list)  # whitelist regexes
    labels: dict = field(default_factory=dict)
    drop_label_keys: list[str] = field(default_factory=list)  # filtered_labels


@dataclass
class SinkConf:
    name: str = "sink"
    table: str = "rollup_1m"
    selector: str | None = None
    ttl_hours: float = 1.0
    size_bytes: int = 1 << 30
    parallel: int = 1


@dataclass
class ParametersConf:
    batch_size: int = 200_000
    batch_count: int = 250
    scan_period_s: float = 1.0
    backoff_initial_s: float = 0.5
    backoff_max_s: float = 60.0
    backoff_multiplier: float = 1.5
    backoff_randomization: float = 0.3
    # per-tick incremental compaction trigger: chunks exceeding this many
    # parquet files are rewritten after retention each tick (0 = off)
    max_files_per_chunk: int = 8


@dataclass
class EngineConf:
    scrapers: list[ScraperConf] = field(default_factory=list)
    sinks: list[SinkConf] = field(default_factory=list)
    parameters: ParametersConf = field(default_factory=ParametersConf)
    labels: dict = field(default_factory=dict)  # global labels (router P3)


_ENV_RE = re.compile(r"^env:(\w+)$")


def _resolve_env(value):
    """``env:VAR`` → os.environ['VAR'] (conf.rs:588-602)."""
    if isinstance(value, str):
        m = _ENV_RE.match(value)
        if m:
            var = m.group(1)
            if var not in os.environ:
                raise KeyError(f"config references undefined env var {var}")
            return os.environ[var]
    return value


def _env_labels(prefix: str = "BEAMIUM_LABEL_") -> dict:
    """BEAMIUM_LABEL_foo=bar → {'foo': 'bar'} (conf.rs:604-609)."""
    return {
        k[len(prefix):].lower(): v
        for k, v in os.environ.items()
        if k.startswith(prefix)
    }


_DUR_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ms|s|m|h|d)?\s*$", re.IGNORECASE)
# unit group: optional k/m/g/t prefix (with optional binary 'i'), optional
# 'b' — a bare 'i' ('5i') fails the match and raises ValueError, never KeyError
_SIZE_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*((?:[kmgt]i?)?b?)\s*$", re.IGNORECASE)
_SIZE_MULT = {"": 1, "b": 1}
for _i, _p in enumerate("kmgt"):
    _SIZE_MULT[_p] = 1000 ** (_i + 1)
    _SIZE_MULT[_p + "b"] = 1000 ** (_i + 1)
    _SIZE_MULT[_p + "i"] = 1024 ** (_i + 1)
    _SIZE_MULT[_p + "ib"] = 1024 ** (_i + 1)


def parse_duration_ms(v, default_unit_ms: int = 1) -> int:
    """Humanized duration → milliseconds: the reference accepts ``500ms``,
    ``60s``, ``1m``, ``1h`` (src/conf.rs humanized fields); bare numbers
    are taken in ``default_unit_ms`` units."""
    if isinstance(v, (int, float)):
        return int(v * default_unit_ms)
    m = _DUR_RE.match(str(v))
    if not m:
        raise ValueError(f"bad duration: {v!r}")
    n, unit = float(m.group(1)), (m.group(2) or "").lower()
    mult = {"": default_unit_ms, "ms": 1, "s": 1000, "m": 60000,
            "h": 3600000, "d": 86400000}[unit]
    return int(n * mult)


def parse_size_bytes(v) -> int:
    """Humanized size → bytes (``2Kb``, ``100Gb``, ``1GiB``; decimal for
    k/M/G, binary for *iB)."""
    if isinstance(v, (int, float)):
        return int(v)
    m = _SIZE_RE.match(str(v))
    if not m:
        raise ValueError(f"bad size: {v!r}")
    return int(float(m.group(1)) * _SIZE_MULT[(m.group(2) or "").lower()])


_HJSON_LINE_COMMENT = re.compile(r"^\s*(//|#)")
_TRAILING_COMMA = re.compile(r",(\s*[}\]])")


def _parse_text(text: str, ext: str) -> dict:
    """Parse one config document. Formats mirror the reference's loader
    (hjson/json/toml/yaml/ini, src/conf.rs:569-690): json & yaml natively,
    toml via stdlib tomllib, ini via configparser (sections → nested
    dicts), hjson via a tolerant reduction (//-and-#-comment lines and
    trailing commas stripped, then json)."""
    ext = ext.lower().lstrip(".")
    if ext == "toml":
        import tomllib

        return tomllib.loads(text)
    if ext == "ini":
        import configparser

        cp = configparser.ConfigParser()
        cp.read_string(text)
        return {s: dict(cp.items(s)) for s in cp.sections()}
    if ext in ("yaml", "yml"):
        import yaml  # type: ignore

        return yaml.safe_load(text) or {}
    if ext == "hjson":
        lines = [
            ln for ln in text.splitlines() if not _HJSON_LINE_COMMENT.match(ln)
        ]
        return json.loads(_TRAILING_COMMA.sub(r"\1", "\n".join(lines)))
    # json or unknown: try json, fall back to yaml
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        try:
            import yaml  # type: ignore

            return yaml.safe_load(text) or {}
        except ImportError as e:
            raise ValueError("config is not JSON and PyYAML is unavailable") from e


def _deep_merge(base: dict, over: dict) -> dict:
    """Later layer wins per key; dicts merge recursively (the reference's
    layered set_* merge, src/conf.rs:101-184)."""
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def default_config_layers() -> list[str]:
    """The reference's search order: /etc/beamium, then $HOME/.beamium,
    then an explicit file (src/conf.rs:101-122)."""
    home = os.path.expanduser("~")
    cands = []
    for base in ("/etc/beamium", os.path.join(home, ".beamium")):
        for ext in ("json", "yaml", "yml", "toml", "ini", "hjson"):
            cands.append(os.path.join(base, f"config.{ext}"))
    return [c for c in cands if os.path.isfile(c)]


def load_conf_layered(paths: list[str]) -> EngineConf:
    """Merge config documents in order (later wins) and build EngineConf."""
    raw: dict = {}
    for p in paths:
        with open(p) as f:
            raw = _deep_merge(raw, _parse_text(f.read(), os.path.splitext(p)[1]))
    return load_conf(raw)


def watch_and_rerun(
    path: str,
    on_change,
    poll_s: float = 0.5,
    debounce_s: float = 2.0,
    max_iters: int | None = None,
    sleep=None,
):
    """Hot-reload driver loop: poll the config file's mtime; after a change
    has been stable for ``debounce_s`` (the reference's 2 s debounce,
    src/conf.rs:622, restart at src/main.rs:148-205), invoke
    ``on_change(EngineConf)``. The callee restarts the job from checkpoint,
    so the rerun replays exactly the unforwarded chunks. ``max_iters``
    bounds the loop for tests; returns the number of reloads fired."""
    import time as _time

    sleep = sleep or _time.sleep
    last_mtime = os.stat(path).st_mtime
    pending_since: float | None = None
    reloads = 0
    it = 0
    while max_iters is None or it < max_iters:
        it += 1
        sleep(poll_s)
        try:
            m = os.stat(path).st_mtime
        except FileNotFoundError:
            continue
        now = _time.monotonic()
        if m != last_mtime:
            last_mtime = m
            pending_since = now
        if pending_since is not None and now - pending_since >= debounce_s:
            pending_since = None
            on_change(load_conf(path))
            reloads += 1
    return reloads


def load_conf(source) -> EngineConf:
    """dict | config file path (json/yaml/toml/ini/hjson by extension) →
    EngineConf with env interpolation."""
    if isinstance(source, str):
        with open(source) as f:
            text = f.read()
        raw = _parse_text(text, os.path.splitext(source)[1])
    else:
        raw = dict(source)

    def labels_of(d: dict) -> dict:
        return {k: _resolve_env(v) for k, v in (d or {}).items()}

    scrapers = [
        ScraperConf(
            name=name,
            format=s.get("format", "prometheus"),
            period_s=parse_duration_ms(s.get("period", 60000)) // 1000,
            metrics=list(s.get("metrics", [])),
            labels=labels_of(s.get("labels", {})),
            drop_label_keys=list(s.get("filtered_labels", [])),
        )
        for name, s in (raw.get("scrapers") or {}).items()
    ]
    sinks = [
        SinkConf(
            name=name,
            table=s.get("table", name),
            selector=s.get("selector"),
            # reference ttl default 1h, bare numbers are SECONDS
            # (src/conf.rs:350-359)
            ttl_hours=parse_duration_ms(s.get("ttl", 3600), 1000) / 3600000.0,
            size_bytes=parse_size_bytes(s.get("size", 1 << 30)),
            parallel=int(s.get("parallel", 1)),
        )
        for name, s in (raw.get("sinks") or {}).items()
    ]
    p = raw.get("parameters") or {}
    bo = p.get("backoff") or {}
    params = ParametersConf(
        batch_size=parse_size_bytes(p.get("batch-size", 200_000)),
        batch_count=int(p.get("batch-count", 250)),
        scan_period_s=parse_duration_ms(p.get("scan-period", 1000)) / 1000.0,
        backoff_initial_s=parse_duration_ms(bo.get("initial", 500)) / 1000.0,
        backoff_max_s=parse_duration_ms(bo.get("max", 60000)) / 1000.0,
        backoff_multiplier=float(bo.get("multiplier", 1.5)),
        backoff_randomization=float(bo.get("randomization", 0.3)),
        max_files_per_chunk=int(p.get("max-files-per-chunk", 8)),
    )
    labels = labels_of(raw.get("labels", {}))
    labels.update(_env_labels())
    return EngineConf(scrapers=scrapers, sinks=sinks, parameters=params, labels=labels)
