"""WARC corpus IO — the web-crawl interchange format (ISO 28500; the
shape Common Crawl ships and every web-text pipeline starts from).

The engine's corpus boundary so far speaks parquet and JSONL
(sources/corpus.py); this module adds the crawl-native format:

- :func:`read_warc` — distributed ingest of ``.warc`` / ``.warc.gz``
  shards. Files load through Spark's ``binaryFile`` source (executors
  read via the Hadoop FileSystem — file:/hdfs:/s3a: roots all work, no
  driver-POSIX assumption, same contract as the tier store), then one
  Arrow-batched ``mapInPandas`` pass parses records LENIENTLY: scan to
  the next ``WARC/1.0`` magic, headers to the blank line, payload by
  ``Content-Length`` — stray bytes between records are skipped, exactly
  how warcio-style readers survive real crawl data. Parallelism = shard
  count (the CC convention of ~1 GB shards makes that the natural task
  size); a shard is held in memory while parsed — the same bound the
  gzip-compressed format imposes on any reader (non-splittable).
- :func:`write_warc` — distributed egress: each record is rendered to
  one string row (headers + CRLF blank line + payload) and written by
  Spark's TEXT sink with ``lineSep='\\r\\n'`` plus one trailing CRLF in
  the row, so consecutive records are separated by the spec's blank
  line. Pure Catalyst (concat/length projections — no Python); payload
  is Content-Length-delimited so embedded newlines in document text
  never confuse a reader. Text payloads only (the web-TEXT corpus
  case); binary payloads would need the binary sink this engine
  reserves for its block store.

Citation: the reference ships metrics files, not crawls
(/root/reference/src/sink.rs); the WARC boundary is part of the
corpus-pipeline surface mandated by the north_star.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_MAGIC = b"WARC/1.0"


def _parse_warc_bytes(path: str, buf: bytes):
    """Lenient single-buffer WARC parser: yields (headers, payload)."""
    if buf[:2] == b"\x1f\x8b":  # gzip magic — handles multi-member .warc.gz
        import gzip
        import io

        buf = gzip.GzipFile(fileobj=io.BytesIO(buf)).read()
    i = 0
    while True:
        j = buf.find(_MAGIC, i)
        if j < 0:
            break
        he = buf.find(b"\r\n\r\n", j)
        if he < 0:
            break
        hdrs: dict[str, str] = {}
        for line in buf[j:he].decode("utf-8", "replace").split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                hdrs[k.strip().lower()] = v.strip()
        try:
            n = max(0, int(hdrs.get("content-length", "0")))
        except ValueError:
            n = 0
        payload = bytes(buf[he + 4 : he + 4 + n])
        yield hdrs, payload
        i = he + 4 + n


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC ingest → :data:`WARC_SCHEMA` rows (one per
    record; ``headers`` carries every header lower-cased for fields the
    typed columns don't surface). ``path`` is anything ``binaryFile``
    accepts (glob, directory, comma list)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for hdrs, payload in _parse_warc_bytes(p, bytes(content)):
                    out.append(
                        {
                            "path": p,
                            "warc_type": hdrs.get("warc-type"),
                            "record_id": hdrs.get("warc-record-id"),
                            "uri": hdrs.get("warc-target-uri"),
                            "warc_date": hdrs.get("warc-date"),
                            "content_type": hdrs.get("content-type"),
                            "content_length": len(payload),
                            "headers": hdrs,
                            "payload": payload,
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(_parse, WARC_SCHEMA)


def _clean_header(col):
    # header values must not contain CR/LF (would forge record structure);
    # NULL folds to '' — a NULL operand would NULL the whole concat'd
    # record and drop the row at the text sink
    return F.regexp_replace(
        F.coalesce(col.cast("string"), F.lit("")), "[\r\n]+", " "
    )


def write_warc(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    uri_col: str | None = None,
    date: str = "2025-01-01T00:00:00Z",
    content_type: str = "text/plain",
    meta_cols: tuple[str, ...] = (),
    shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Render each document to one WARC ``response`` record and write
    the shard set. ``record_id`` embeds ``id_col``
    (``<urn:beamium:ID>``) so a round-trip can rejoin documents;
    ``meta_cols`` ride along as ``X-Meta-<col>`` headers. ``shards``
    repartitions the output file count (same contract as write_jsonl);
    ``compression='gzip'`` emits ``.warc.gz``-style shards."""
    uri = (
        _clean_header(F.col(uri_col))
        if uri_col
        else F.concat(F.lit("urn:doc:"), F.col(id_col).cast("string"))
    )
    header_parts = [
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.concat(
            F.lit("WARC-Record-ID: <urn:beamium:"),
            F.col(id_col).cast("string"),
            F.lit(">\r\n"),
        ),
        F.concat(F.lit("WARC-Target-URI: "), uri, F.lit("\r\n")),
        F.lit(f"WARC-Date: {date}\r\n"),
        F.lit(f"Content-Type: {content_type}\r\n"),
    ]
    for c in meta_cols:
        header_parts.append(
            F.concat(F.lit(f"X-Meta-{c}: "), _clean_header(F.col(c)), F.lit("\r\n"))
        )
    body = F.coalesce(F.col(text_col), F.lit(""))
    record = F.concat(
        *header_parts,
        F.concat(
            F.lit("Content-Length: "),
            F.octet_length(body).cast("string"),
            F.lit("\r\n\r\n"),
        ),
        body,
        # one CRLF here + the writer's lineSep CRLF = the spec's blank
        # line between records
        F.lit("\r\n"),
    )
    out = docs.select(record.alias("value"))
    if shards is not None:
        out = out.repartition(shards)
    w = out.write.mode("overwrite").option("lineSep", "\r\n")
    if compression:
        w = w.option("compression", compression)
    w.text(path)
