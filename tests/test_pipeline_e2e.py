"""The complete training-data user journey, composed end to end:

JSONL shards → curate (dedup + decontam + quality + domain + LM) →
weighted mixture → sequence packing + shard manifest → curated JSONL out.

Each stage is individually oracled by the gate; this test pins that they
COMPOSE — schemas line up, verdict columns don't leak into the output,
and the numbers reconcile across stage boundaries (the property a
migrating user actually depends on)."""

import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from beamium_spark.operators.packing import pack_sequences, sequence_manifest
from beamium_spark.operators.sampling import mix_corpora
from beamium_spark.plans.curate import curate
from beamium_spark.sources.corpus import DOCS_SCHEMA, read_jsonl, write_jsonl

FLUENT = (
    "the quick brown fox jumps over the lazy dog and it was that good "
    "for everyone in the field to see it happen again and again today"
)


def test_full_training_data_pipeline(spark, tmp_path):
    # --- stage 0: land raw corpora as JSONL shards (two sources) -------
    raw_a = [Row(doc_id=i, text=FLUENT + f" alpha {i}", lang="en", source="a.com")
             for i in range(1, 41)]
    raw_a += [Row(doc_id=100, text=FLUENT + " alpha 1", lang="en", source="a.com")]  # dup
    raw_a += [Row(doc_id=101, text="1 2 3 4", lang="en", source="a.com")]  # low quality
    raw_b = [Row(doc_id=i, text=FLUENT + f" beta {i}", lang="en", source="b.net")
             for i in range(200, 220)]
    in_a, in_b = str(tmp_path / "in_a"), str(tmp_path / "in_b")
    write_jsonl(spark.createDataFrame(raw_a, DOCS_SCHEMA), in_a, shards=2)
    write_jsonl(spark.createDataFrame(raw_b, DOCS_SCHEMA), in_b, shards=1)

    # --- stage 1: curate each source (one call) ------------------------
    clean_a, report_a = curate(
        read_jsonl(spark, in_a), min_quality=0.5, domain_col="source",
        min_lm_logprob=-12.0, materialize=True,
    )
    clean_b, _ = curate(read_jsonl(spark, in_b), materialize=True)
    rep = {r["outcome"]: r["n"] for r in report_a.collect()}
    assert rep["duplicate"] == 1 and rep["low_quality"] == 1
    assert rep["kept"] == 40

    # --- stage 2: weighted mixture -------------------------------------
    mix = mix_corpora(
        [("a", clean_a), ("b", clean_b)], {"a": 1.0, "b": 1.0}, 40
    )
    by_src = {r["mix_source"]: r["n"] for r in
              mix.groupBy("mix_source").agg(F.count("*").alias("n")).collect()}
    assert set(by_src) == {"a", "b"}
    assert sum(by_src.values()) <= 60

    # --- stage 3: packing layout + manifest -----------------------------
    packed = pack_sequences(mix, seq_len=64, n_shards=4)
    man = sequence_manifest(packed, seq_len=64)
    assert packed.count() == mix.count()  # every mixed doc placed
    # manifest sequence counts reconcile with each shard's stream length
    seqs = {
        r["shard"]: r["n_seq"]
        for r in man.groupBy("shard")
        .agg((F.max("seq_id") + 1).alias("n_seq"))
        .collect()
    }
    stream = {
        r["shard"]: r["hi"]
        for r in packed.groupBy("shard").agg(F.max("tok_end").alias("hi")).collect()
    }
    assert set(seqs) == set(stream)
    for sh, hi in stream.items():
        assert seqs[sh] == -(-hi // 64), (sh, hi, seqs[sh])

    # --- stage 4: curated corpus back out as JSONL ----------------------
    out = str(tmp_path / "out")
    write_jsonl(
        mix.select("doc_id", "text", "lang", "source"), out, shards=2
    )
    back = read_jsonl(spark, out)
    assert back.count() == mix.count()
    # verdict/bookkeeping columns never leak into the published corpus
    assert set(back.columns) == {"doc_id", "text", "lang", "source"}
    assert glob.glob(os.path.join(out, "part-*.json.gz"))
