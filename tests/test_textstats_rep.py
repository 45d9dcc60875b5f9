"""ngram_frequencies (BPE pair counting) and repetition_stats (Gopher
repetition filters)."""

import pyspark.sql.functions as F
import pytest

from beamium_spark.operators.textstats import ngram_frequencies, repetition_stats


def test_ngram_frequencies_counts_pairs(spark):
    docs = spark.createDataFrame(
        [("a", "to be or not to be"), ("b", "to be is to do")],
        "doc_id string, text string",
    )
    rows = {r["gram"]: (r["n"], r["rank"]) for r in ngram_frequencies(docs, n=2, k=10).collect()}
    assert rows["to be"] == (3, 1)  # most frequent pair — the BPE merge winner
    assert rows["be or"][0] == 1
    # short doc contributes nothing
    docs2 = spark.createDataFrame([("c", "single")], "doc_id string, text string")
    assert ngram_frequencies(docs2, n=2).count() == 0


def test_ngram_frequencies_deterministic_ties(spark):
    docs = spark.createDataFrame([("a", "x y z w")], "doc_id string, text string")
    got = [r["gram"] for r in ngram_frequencies(docs, n=2, k=3).collect()]
    assert got == sorted(got)  # equal counts -> gram asc


def test_repetition_stats(spark):
    docs = spark.createDataFrame(
        [
            ("clean", "one two three\nfour five six\nseven eight nine"),
            ("spam", "buy now\nbuy now\nbuy now\nbuy now"),
            ("tiny", "word"),
            ("loop", "go go go go go go"),
        ],
        "doc_id string, text string",
    )
    out = {r["id"]: r for r in repetition_stats(docs).collect()}
    assert out["clean"]["n_lines"] == 3
    assert out["clean"]["dup_line_frac"] == 0.0
    # spam: 4 lines, 1 distinct -> 0.75 dup; bigrams run over the word
    # SEQUENCE (line breaks are whitespace): "buy now"x4 of 7 bigrams
    assert out["spam"]["n_lines"] == 4
    assert out["spam"]["dup_line_frac"] == 0.75
    assert out["spam"]["top_bigram_frac"] == round(4 / 7, 6)
    # single word: no bigrams -> 0, not NULL
    assert out["tiny"]["top_bigram_frac"] == 0.0
    # "go go" x5 of 5 bigrams
    assert out["loop"]["top_bigram_frac"] == 1.0
    assert pytest is not None and F is not None


def test_scrub_pii(spark):
    from beamium_spark.operators.textstats import pii_counts, scrub_pii

    docs = spark.createDataFrame(
        [
            ("a", "mail me at jo.doe+x@example.co.uk or call +4915112345678"),
            ("b", "server 192.168.0.1 and also user@10.0.0.1"),
            ("c", "clean text with plain numbers 1234567890 and 1.5"),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: (r["scrubbed"], r["email"], r["ipv4"], r["phone"])
        for r in docs.select(
            "doc_id",
            scrub_pii(F.col("text")).alias("scrubbed"),
            *[v.alias(k) for k, v in pii_counts(F.col("text")).items()],
        ).collect()
    }
    assert out["a"] == ("mail me at <EMAIL> or call <PHONE>", 1, 0, 1)
    # the email pattern requires an alphabetic TLD, so an IP-domain
    # address is NOT an email match — its IP part scrubs as an IP
    assert out["b"] == ("server <IP> and also user@<IP>", 0, 2, 0)
    # plain numbers and decimals untouched
    assert out["c"] == ("clean text with plain numbers 1234567890 and 1.5", 0, 0, 0)
