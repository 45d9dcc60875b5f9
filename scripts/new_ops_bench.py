"""Indicative single-session throughput for the round-5 operator batch
at sf0.1 (one warm-up scan per table, then one timed action per op —
NOT the subprocess-isolated headline harness in bench.py; these numbers
contextualize the new surface, the tripwired headline suite stays the
cross-round metric). Appends a markdown table to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    from beamium_spark.session import get_spark

    spark = get_spark(
        app_name="new_ops_bench", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).repartition(
        int(CPUS), "doc_id"
    )
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    import __spark_entry__ as entry

    pages = entry._pages(spark, SF_DIR)
    # warm the page cache once per table
    n_docs = docs.count()
    n_events = events.count()
    n_pages = pages.count()

    rows = []

    def timed(name, scale, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        rows.append((name, scale, dt, out))
        print(f"{name}: {dt:.2f}s ({out})", flush=True)

    from beamium_spark.operators.textstats import c4_clean
    timed("c4_clean", n_docs, lambda: c4_clean(docs).filter("keep").count())

    from beamium_spark.operators.dedup import url_filter_stats
    timed("url_filter", n_pages,
          lambda: url_filter_stats(pages.select("url")).filter("keep").count())

    from beamium_spark.operators.bpe import train_bpe
    timed("train_bpe (8 merges)", n_docs,
          lambda: len(train_bpe(docs, num_merges=8, min_count=2)))

    from beamium_spark.operators.similarity import semantic_dedup
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_emb = emb.count()
    timed("semantic_dedup", n_emb,
          lambda: semantic_dedup(emb, threshold=0.9, n_clusters=8)
          .filter("keep").count())

    from beamium_spark.operators.funnel import funnel, retention_cohorts, event_paths
    timed("funnel", n_events,
          lambda: funnel(events, ("view", "click", "purchase"), within="7 days")
          .filter("converted").count())
    timed("retention_cohorts", n_events,
          lambda: retention_cohorts(events, "1 week", 8).count())
    timed("event_paths", n_events,
          lambda: event_paths(events, k=3, top=20).count())

    from beamium_spark.operators.asof import interval_join
    iv = spark.createDataFrame(
        [("click", i,) for i in range(500)], "event_type string, iv_id int"
    ).select(
        "event_type", "iv_id",
        F.expr("timestamp '2024-01-01' + make_interval(0,0,0,0, iv_id*2)").alias("start"),
        F.expr("timestamp '2024-01-01' + make_interval(0,0,0,0, iv_id*2+3)").alias("end"),
    )
    timed("interval_join (500 spans)", n_events,
          lambda: interval_join(events, iv, on=("event_type",), bucket="1 hour").count())

    from beamium_spark.sources.warc import read_warc, write_warc
    import tempfile
    work = tempfile.mkdtemp(prefix="new_ops_bench_warc_")
    timed("warc write+read", n_docs, lambda: (
        write_warc(docs, os.path.join(work, "w"), shards=int(CPUS)),
        read_warc(spark, os.path.join(work, "w")).count(),
    )[1])
    import shutil
    shutil.rmtree(work, ignore_errors=True)

    print("\n| op | input rows | wall (s) | rows/s |")
    print("| --- | --- | --- | --- |")
    for name, scale, dt, _ in rows:
        print(f"| {name} | {scale:,} | {dt:.2f} | {scale / dt:,.0f} |")
    spark.stop()


if __name__ == "__main__":
    main()
