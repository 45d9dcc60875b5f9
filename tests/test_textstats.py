"""Text analysis: langid heuristic, quality features, token counts,
fingerprint determinism."""

from pyspark.sql import functions as F

from beamium_spark.operators.textstats import (
    fingerprint,
    langid,
    quality_features,
    quality_score,
    token_count_bpe_ish,
    token_count_ws,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_langid_obvious(spark):
    assert _one(spark, "the cat sat on the mat and it was good", langid(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist nicht da", langid(F.col("text"))) == "de"
    assert _one(spark, "le chat est sur la table et les livres", langid(F.col("text"))) == "fr"
    assert _one(spark, "el perro y la casa es una cosa que", langid(F.col("text"))) == "es"
    assert _one(spark, "zzz qqq xxx", langid(F.col("text"))) == "und"


def test_token_counts(spark):
    assert _one(spark, "a b  c", token_count_ws(F.col("text"))) == 3
    assert _one(spark, "", token_count_ws(F.col("text"))) == 0
    # don't-split-words, split-punct: "don't" -> don / ' / t
    assert _one(spark, "don't stop", token_count_bpe_ish(F.col("text"))) == 4


def test_quality_features_ranges(spark, tiny_web_pages):
    feats = quality_features(F.col("text"))
    df = tiny_web_pages.select(*[v.alias(k) for k, v in feats.items()])
    bad = df.filter(
        (F.col("punct_ratio") < 0) | (F.col("punct_ratio") > 1)
        | (F.col("digit_ratio") < 0) | (F.col("digit_ratio") > 1)
        | (F.col("stopword_ratio") < 0) | (F.col("stopword_ratio") > 1)
    )
    assert bad.count() == 0


def test_quality_score_discriminates(spark):
    good = "the quick brown fox jumps over the lazy dog and it was good for all of us in the end today"
    bad = "000 111 222 !!! ??? ,,, 333 444"
    assert _one(spark, good, quality_score(F.col("text"))) > _one(
        spark, bad, quality_score(F.col("text"))
    )


def test_fingerprint_deterministic_and_order_sensitive(spark):
    a = _one(spark, "one two three", fingerprint(F.col("text")))
    b = _one(spark, "one two three", fingerprint(F.col("text")))
    c = _one(spark, "three two one", fingerprint(F.col("text")))
    assert a == b
    # order-sensitive: same multiset of word lengths but different order
    d = _one(spark, "two one three", fingerprint(F.col("text")))
    assert (a, c) != (c, d) or a != c or c != d  # at least one differs
    assert a != d or a != c


def test_c4_clean_line_and_doc_rules(spark):
    import pytest as _pytest

    from beamium_spark.operators.textstats import c4_clean

    good = "\n".join(
        [
            "This is a perfectly reasonable sentence of text.",
            "Another line that carries enough words to survive!",
            'Is this a question with enough words in it?"',
        ]
    )
    docs = spark.createDataFrame(
        [
            (0, good),
            # line-level drops: short, no terminal punct, javascript
            (1, good + "\nshort line."
                 + "\nThis line has plenty of words but no terminal punct"
                 + "\nPlease enable JavaScript to view the comments."),
            # doc-level: lorem ipsum anywhere kills the page
            (2, good + "\nLorem Ipsum dolor sit amet filler text here."),
            # doc-level: a curly brace anywhere kills the page (code)
            (3, good + "\nfunction f() { return 1; } and more words here."),
            # fewer than 3 surviving lines
            (4, "Only one surviving line with enough words here."),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in c4_clean(docs).collect()}
    assert out[0].keep and out[0].clean_text == good
    assert out[0].n_lines == 3 and out[0].n_lines_kept == 3
    # doc 1 keeps only the 3 good lines — the 3 bad ones each hit one rule
    assert out[1].keep and out[1].clean_text == good
    assert out[1].n_lines == 6 and out[1].n_lines_kept == 3
    assert not out[2].keep and not out[3].keep
    assert not out[4].keep and out[4].n_lines_kept == 1

    with _pytest.raises(ValueError, match="min_words_per_line"):
        c4_clean(docs, min_words_per_line=0)
    with _pytest.raises(ValueError, match="min_lines"):
        c4_clean(docs, min_lines=0)


def test_corpus_composition_fractions(spark):
    from beamium_spark.operators.textstats import corpus_composition

    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "web"),
            (2, "vier fünf", "de", "web"),
            (3, "six seven eight nine", "en", "news"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {(r.lang, r.source): r for r in corpus_composition(docs).collect()}
    assert out[("en", "web")].n_docs == 1 and out[("en", "web")].n_tokens == 3
    assert abs(out[("en", "news")].token_frac - 4 / 9) < 1e-6
    assert abs(sum(r.doc_frac for r in out.values()) - 1.0) < 1e-5  # 6dp-rounded thirds


def test_token_length_histogram_bins(spark):
    import pytest as _pytest

    from beamium_spark.operators.textstats import token_length_histogram

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([3, 7, 55, 60, 5000])],
        "doc_id long, text string",
    )
    out = {r.bin: r for r in token_length_histogram(docs, bin_width=50, max_bins=10).collect()}
    assert out[0].n_docs == 2 and out[0].min_tokens == 3
    assert out[1].n_docs == 2 and out[1].bin_lo == 50
    assert out[10].n_docs == 1 and out[10].max_tokens == 5000  # overflow bucket
    with _pytest.raises(ValueError, match="bin_width"):
        token_length_histogram(docs, bin_width=0)
