"""JSONL corpus IO — the LLM-data interchange format as a source/sink.

Web-text corpora ship as newline-delimited JSON (one document object per
line, usually gzip/zstd-compressed shards): Common Crawl derivatives,
Dolma, RedPajama, FineWeb all use the shape. A user migrating their
pipeline onto this engine needs to READ those shards and WRITE curated
output back in the same format; this module is that boundary, kept thin
on purpose — Spark's native JSON data source already does distributed,
splittable-when-uncompressed, schema-enforced line parsing, so both
directions stay pure Catalyst (no Python in the row path).

Scale notes:

- **Always pass a schema on read.** Schema inference scans the whole
  input once before the real job (a 2× read at 100 TB);
  :data:`DOCS_SCHEMA` covers the engine's documents shape and
  ``read_jsonl(..., schema=...)`` takes any other.
- **Compressed shards are not splittable** (one gzip/zstd member = one
  task) — fine when the corpus is many ~100 MB shards (the usual
  layout), pathological for one giant file; ``write_jsonl`` therefore
  exposes ``shards`` to pick the output file count.
- Malformed lines follow Spark's JSON modes; the default PERMISSIVE
  keeps the line with NULL fields plus ``_corrupt_record`` when the
  caller adds that column — corpus curation's quality gates drop the
  wreckage anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str = DOCS_SCHEMA,
) -> DataFrame:
    """Documents from JSONL shards (plain or .gz/.zst — Spark picks the
    codec from the extension). Explicit schema, never inference."""
    return spark.read.schema(schema).json(path)


def write_jsonl(
    docs: DataFrame,
    path: str,
    compression: str | None = "gzip",
    shards: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Documents → JSONL shard directory. ``shards`` repartitions to the
    target file count (compressed shards are the task unit on re-read,
    so pick shard-count ≈ downstream parallelism); None keeps the
    input partitioning."""
    if shards is not None:
        docs = docs.repartition(shards)
    w = docs.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
