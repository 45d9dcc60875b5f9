"""Duplicate-span detection/removal (operators/spandedup.py).

Planted fixtures: a shared 15-word boilerplate block across three docs,
an intra-doc repeat, a clean doc, and a doc shorter than n. Assertions
value-check spans, per-doc stats, and the rewrite's first-occurrence-wins
cut semantics.
"""

import pytest

from beamium_spark.operators.spandedup import (
    duplicate_span_stats,
    duplicate_spans,
    remove_duplicate_spans,
)

BOILER = "please subscribe to our newsletter for weekly updates from the editorial team thank you today"  # 15 words


@pytest.fixture(scope="module")
def docs(spark):
    uniq = lambda tag, k: " ".join(f"{tag}{i}" for i in range(k))
    rows = [
        # doc 1: boilerplate then 20 unique words
        (1, BOILER + " " + uniq("a", 20)),
        # doc 2: 10 unique words then the same boilerplate
        (2, uniq("b", 10) + " " + BOILER),
        # doc 3: boilerplate sandwiched between unique runs
        (3, uniq("c", 5) + " " + BOILER + " " + uniq("d", 5)),
        # doc 4: clean, 30 unique words
        (4, uniq("e", 30)),
        # doc 5: intra-doc repeat of its own 13-word phrase
        (5, uniq("f", 13) + " xxx " + uniq("f", 13)),
        # doc 6: too short for any 13-gram
        (6, "short doc only five words"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_spans_cover_planted_boilerplate(docs):
    spans = {
        r["id"]: (r["span_start"], r["span_end"])
        for r in duplicate_spans(docs).collect()
    }
    # 15-word block => positions 0..2 duplicated grams => span 15 words
    assert spans[1] == (0, 15)
    assert spans[2] == (10, 25)
    assert spans[3] == (5, 20)
    assert 4 not in spans and 6 not in spans
    # intra-doc repeat: both occurrences flagged, merged across the 1-word
    # gap? gap 'xxx' breaks consecutiveness (positions 0 and 14) -> 2 spans
    multi = [r for r in duplicate_spans(docs).collect() if r["id"] == 5]
    assert sorted((r["span_start"], r["span_end"]) for r in multi) == [
        (0, 13),
        (14, 27),
    ]


def test_stats_fraction(docs):
    st = {r["id"]: r for r in duplicate_span_stats(docs).collect()}
    assert st[4]["dup_words"] == 0 and st[4]["dup_fraction"] == 0.0
    assert st[6]["dup_words"] == 0
    assert st[1]["total_words"] == 35 and st[1]["dup_words"] == 15
    assert abs(st[1]["dup_fraction"] - 15 / 35) < 1e-12
    assert st[5]["n_spans"] == 2 and st[5]["dup_words"] == 26
    # every input doc appears exactly once
    assert duplicate_span_stats(docs).count() == docs.count()


def test_rewrite_first_occurrence_wins(docs):
    rw = {r["id"]: r for r in remove_duplicate_spans(docs).collect()}
    # doc 1 is the corpus-first occurrence (min (id,pos)) -> keeps boiler
    assert rw[1]["text"].startswith(BOILER)
    assert rw[1]["cut_words"] == 0
    # docs 2 and 3 lose the block, keep their unique runs in order
    assert BOILER.split()[3] not in rw[2]["text"].split()
    assert rw[2]["text"] == " ".join(f"b{i}" for i in range(10))
    assert rw[2]["cut_words"] == 15
    assert rw[3]["text"] == " ".join(
        [f"c{i}" for i in range(5)] + [f"d{i}" for i in range(5)]
    )
    # intra-doc: first occurrence survives, second cut
    assert rw[5]["text"] == " ".join([f"f{i}" for i in range(13)] + ["xxx"])
    # clean/short docs untouched (whitespace-normalized)
    assert rw[4]["cut_words"] == 0 and rw[6]["text"] == "short doc only five words"


def test_spans_disjoint_and_coverage_equals_stats(docs):
    spans = duplicate_spans(docs).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["id"], []).append((r["span_start"], r["span_end"]))
    for sid, ivs in by_doc.items():
        ivs.sort()
        for (a0, a1), (b0, b1) in zip(ivs, ivs[1:]):
            assert a1 < b0, f"overlapping spans in doc {sid}"
    st = {r["id"]: r["dup_words"] for r in duplicate_span_stats(docs).collect()}
    for sid, ivs in by_doc.items():
        assert st[sid] == sum(e - s for s, e in ivs)
