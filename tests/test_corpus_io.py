"""JSONL corpus IO: roundtrip fidelity, compression, schema enforcement."""

import glob
import json
import os

from pyspark.sql import Row

from beamium_spark.sources.corpus import DOCS_SCHEMA, read_jsonl, write_jsonl


def _docs(spark):
    rows = [
        Row(doc_id=1, text='plain text with "quotes" and\nnewline', lang="en", source="s0"),
        Row(doc_id=2, text="unicode: héllo — ☃", lang="fr", source="s1"),
        Row(doc_id=3, text=None, lang=None, source="s0"),
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_jsonl_roundtrip_gzip(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_jsonl(docs, out, shards=2)
    files = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert len(files) == 2
    back = read_jsonl(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_jsonl_uncompressed_matches_stdlib_json(spark, tmp_path):
    docs = _docs(spark).filter("doc_id <= 2")
    out = str(tmp_path / "plain")
    write_jsonl(docs, out, compression=None, shards=1)
    (f,) = glob.glob(os.path.join(out, "part-*.json"))
    lines = [json.loads(l) for l in open(f, encoding="utf-8")]
    assert {l["doc_id"] for l in lines} == {1, 2}
    assert any("héllo — ☃" in l["text"] for l in lines)


def test_jsonl_read_ignores_extra_fields_and_enforces_schema(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    with open(p / "a.jsonl", "w", encoding="utf-8") as fh:
        fh.write('{"doc_id": 7, "text": "kept", "lang": "en", "source": "x", "extra": 1}\n')
        fh.write('{"doc_id": 8, "text": "no lang"}\n')
    back = {r.doc_id: r for r in read_jsonl(spark, str(p)).collect()}
    assert back[7].text == "kept" and "extra" not in back[7].asDict()
    assert back[8].lang is None and back[8].source is None
