"""Benchmark decontamination: planted verbatim/partial leaks are flagged,
clean docs survive, the benchmark side broadcasts."""

import pyspark.sql.functions as F
import pytest

from beamium_spark.operators.decontam import contamination, decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    words = "the quick brown fox jumps over a lazy dog near riverbank".split()

    def text(i, leak=None):
        base = " ".join(words[(i + k) % len(words)] for k in range(30))
        return base + (" " + leak if leak else "")

    bench_q = "what is the capital of france paris is the capital of france indeed"
    rows = [(f"d{i:03d}", text(i)) for i in range(40)]
    # d900: verbatim benchmark leak appended; d901: the benchmark text IS
    # the doc; d950 short doc, no leak
    rows.append(("d900", text(3, leak=bench_q)))
    rows.append(("d901", bench_q))
    rows.append(("d950", "tiny doc"))
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    bench = spark.createDataFrame([("q1", bench_q)], "qid string, text string")
    return docs, bench


def test_contamination_flags_planted_leaks(spark, corpus):
    docs, bench = corpus
    rep = contamination(docs, bench, n=13)
    flagged = {r["id"]: r for r in rep.collect()}
    assert set(flagged) == {"d900", "d901"}
    # the full-copy doc is 100% contaminated
    assert flagged["d901"]["hit_frac"] == 1.0
    assert 0 < flagged["d900"]["hit_frac"] < 1.0


def test_decontaminate_drops_only_flagged(spark, corpus):
    docs, bench = corpus
    clean = decontaminate(docs, bench, n=13)
    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert "d900" not in ids and "d901" not in ids
    assert clean.count() == docs.count() - 2
    assert "d950" in ids  # short doc unharmed


def test_short_benchmark_prompt_matches_verbatim_copy(spark):
    """A benchmark prompt shorter than n words still catches its verbatim
    copy (whole-text single-gram convention on both sides)."""
    docs = spark.createDataFrame(
        [("a", "secret answer token"), ("b", "totally unrelated words")],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame([("q", "secret answer token")], "qid string, text string")
    rep = contamination(docs, bench, n=13)
    assert [r["id"] for r in rep.collect()] == ["a"]


def test_benchmark_side_broadcasts(spark, corpus):
    docs, bench = corpus
    plan = (
        contamination(docs, bench, n=13)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert F is not None and pytest is not None  # keep imports
