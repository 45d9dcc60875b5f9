"""WARC source/sink: spec-shaped rendering, lenient parsing, byte-exact
payload round-trips (plain and gzip), multi-line payloads, stray bytes."""

import pytest
from pyspark.sql import functions as F


DOCS = [
    (1, "plain single line text", "en", "web"),
    (2, "multi\nline\npayload with\r\nCRLF inside", "de", "web"),
    (3, "", "en", "news"),                       # empty payload
    (4, "unicode: café — emoji \U0001f600", "fr", "web"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    )


def _roundtrip(spark, docs, path, **kw):
    from beamium_spark.sources.warc import read_warc, write_warc

    write_warc(docs, path, meta_cols=("lang", "source"), **kw)
    return read_warc(spark, path)


def test_warc_roundtrip_plain(spark, docs, tmp_path):
    out = _roundtrip(spark, docs, str(tmp_path / "w"))
    rows = {
        int(r.record_id.split(":")[-1].rstrip(">")): r for r in out.collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    for i, text, lang, source in DOCS:
        r = rows[i]
        assert r.payload.decode("utf-8") == text      # byte-exact payload
        assert r.content_length == len(text.encode("utf-8"))
        assert r.warc_type == "response"
        assert r.uri == f"urn:doc:{i}"
        assert r.headers["x-meta-lang"] == lang
        assert r.headers["x-meta-source"] == source


def test_warc_roundtrip_gzip_and_shards(spark, docs, tmp_path):
    out = _roundtrip(
        spark, docs, str(tmp_path / "wz"), shards=2, compression="gzip"
    )
    import glob

    gz = glob.glob(str(tmp_path / "wz" / "*.gz"))
    assert len(gz) == 2  # sharded, compressed files
    got = {
        int(r.record_id.split(":")[-1].rstrip(">")): r.payload.decode("utf-8")
        for r in out.collect()
    }
    assert got == {i: t for i, t, _, _ in DOCS}


def test_warc_lenient_parse_skips_stray_bytes(spark, tmp_path):
    from beamium_spark.sources.warc import read_warc

    raw = (
        b"garbage prefix bytes\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:beamium:7>\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"hello"
        b"\x00\x00junk between records\x00"
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:beamium:8>\r\n"
        b"Content-Length: 2\r\n"
        b"\r\n"
        b"ok"
    )
    p = tmp_path / "lenient"
    p.mkdir()
    (p / "f.warc").write_bytes(raw)
    rows = sorted(read_warc(spark, str(p)).collect(), key=lambda r: r.record_id)
    assert [r.payload for r in rows] == [b"hello", b"ok"]
    # a payload CONTAINING the magic must not split the record
    tricky = (
        b"WARC/1.0\r\n"
        b"WARC-Record-ID: <urn:beamium:9>\r\n"
        b"Content-Length: 13\r\n"
        b"\r\n"
        b"has WARC/1.0x"
    )
    (p / "f.warc").write_bytes(tricky)
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0].payload == b"has WARC/1.0x"
