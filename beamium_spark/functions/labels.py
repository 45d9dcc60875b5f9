"""Label algebra over ``labels: map<string,string>`` columns.

Beamium's unit of data is one GTS text line ``ts// class{k=v,...} value``
and its label ops are string splices (/root/reference/src/lib/mod.rs:26-101).
Here the label set is a first-class ``MapType`` column; the line format
exists only at the edges (parse/format), so Catalyst can prune/codegen the
algebra. Semantics preserved:

- ``add_labels`` *prepends* the new labels (reference prepends the static
  label string, src/lib/mod.rs:51; golden vectors at src/lib/mod.rs:150-172
  expect ``host=foo,rack=toto,type=count`` ordering).
- ``remove_labels`` drops listed keys, keeping relative order of the rest
  (src/lib/mod.rs:88-100).
- map entry order is insertion order (Spark preserves it through
  ``map_concat``/``map_filter``), so formatting round-trips the vectors.

Requires ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by session factory)
so ``map_concat`` on a duplicate key keeps the pre-existing value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def labels_to_str(labels: Column) -> Column:
    """map<k,v> → ``k1=v1,k2=v2`` in entry order (empty map → '')."""
    return F.array_join(
        F.transform(
            F.map_entries(labels),
            lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value")),
        ),
        ",",
    )


def labels_sorted_str(labels: Column) -> Column:
    """Canonical series-identity form: ``k=v`` pairs sorted by key, joined
    with ','. Unlike :func:`labels_to_str` (entry order, for line
    formatting), this is order-insensitive — two points whose label maps
    differ only in entry order canonicalize to the same string, which is
    what grouping by series identity (class + labels,
    /root/reference/src/lib/mod.rs:88-98) requires."""
    return F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(labels),
                lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value")),
            )
        ),
        ",",
    )


def add_labels(labels: Column, static: dict[str, str] | Column) -> Column:
    """Prepend static labels; existing keys win on conflict (LAST_WIN +
    new-first ordering ⇒ old value retained, mirroring the reference which
    never dedups but parses left-to-right)."""
    if isinstance(static, dict):
        if not static:
            return labels
        pairs: list[Column] = []
        for k, v in static.items():
            pairs += [F.lit(k), F.lit(v)]
        static = F.create_map(*pairs)
    return F.map_concat(static, labels)


def remove_labels(labels: Column, keys: list[str]) -> Column:
    """Drop the listed keys (no-op for empty list, src/lib/mod.rs:56-58)."""
    if not keys:
        return labels
    keys_arr = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(labels, lambda k, _v: ~F.array_contains(keys_arr, k))


def format_gts_line(ts_us: Column, cls: Column, labels: Column, value: Column) -> Column:
    """Columns → GTS line ``ts// class{k=v,...} value``
    (shape from /root/reference/src/lib/transcompiler.rs:108)."""
    return F.concat(
        ts_us.cast("string"),
        F.lit("// "),
        cls,
        F.lit("{"),
        labels_to_str(labels),
        F.lit("} "),
        value.cast("string"),
    )


def parse_gts_line(line: Column) -> Column:
    """GTS line → struct(ts_us long, cls string, labels map, value string).

    Inverse of :func:`format_gts_line`; label split mirrors
    /root/reference/src/lib/mod.rs:88-98 (split ',' then '=').
    """
    ts = F.regexp_extract(line, r"^(\d+)//", 1).cast("long")
    cls = F.regexp_extract(line, r"^\d+//\s+([^{\s]+)\{", 1)
    labels_str = F.regexp_extract(line, r"\{(.*)\}", 1)
    value = F.regexp_extract(line, r"\}\s+(\S+)\s*$", 1)
    labels = F.when(labels_str == "", F.map_from_arrays(F.array(), F.array())).otherwise(
        F.map_from_entries(
            F.transform(
                F.split(labels_str, ","),
                lambda kv: F.struct(
                    F.get(F.split(kv, "="), 0).alias("key"),
                    F.get(F.split(kv, "="), 1).alias("value"),
                ),
            )
        )
    )
    return F.struct(
        ts.alias("ts_us"), cls.alias("cls"), labels.alias("labels"), value.alias("value")
    )
