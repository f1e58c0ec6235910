"""Tokenizer fidelity against the reference semantics (WordCount.java:61-101).

Every expectation below was hand-derived from the reference source and the
verified behaviors recorded in SURVEY.md §2.2 / FIXTURES.md §3.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_idf_mapreduce_spark.functions.tokenize import tokenize, tokenize_text


def toks(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(tokenize_text(F.col("text")).alias("w")).head()[0]


def test_basic_lowercase_and_split(spark):
    assert toks(spark, "Hello, hello world") == ["hello", "hello", "world"]


def test_digit_words_dropped_entirely(spark):
    # replaceAll(".*\d.*","") — WordCount.java:63
    assert toks(spark, "abc123 $5 x9y plain") == ["plain"]


def test_digit_check_precedes_entity_decode(spark):
    # '&#39;word' contains digits → dropped before decode could run
    assert toks(spark, "&#39;word keep") == ["keep"]


def test_entity_decode_order_and_nbsp_split(spark):
    # &amp;lt; → &lt; (literal, single pass each) — WordCount.java:66-71
    assert toks(spark, "&amp;lt;") == ["<lt"] or toks(spark, "&amp;lt;") == []
    # &nbsp; injects a space → token re-splits — WordCount.java:71,83-84
    assert toks(spark, "Data&nbsp;data") == ["data", "data"]


def test_html_tags_stripped_even_when_entity_encoded(spark):
    # decode happens before tag strip → &lt;b&gt; vanishes (SURVEY.md T4)
    assert toks(spark, "<b>bold</b> &lt;i&gt;x&lt;/i&gt;") == ["bold", "x"]


def test_punct_trim_outer_only(spark):
    assert toks(spark, "--dash-- end. ...") == ["dash", "end"]
    # interior punctuation survives — WordCount.java:77-78
    assert toks(spark, "don't u.s.a re-do") == ["don't", "u.s.a", "re-do"]


def test_dollar_plus_minus_eq_angle_trimmed(spark):
    # explicit chars beyond \pP: $ + - = < > (WordCount.java:77-78)
    assert toks(spark, "+alpha= >beta$ gamma-") == ["alpha", "beta", "gamma"]


def test_amp_alone_vanishes(spark):
    # '&amp;' → '&' → trimmed to empty → no token (FIXTURES.md §3)
    assert toks(spark, "a &amp; b") == ["a", "b"]


def test_pipe_token_survives_as_word(spark):
    # '|' is Sm, not \pP → survives trim; real columns make this safe
    # (SURVEY.md §1 packed-key hazard)
    assert toks(spark, "a|b c") == ["a|b", "c"]


def test_empty_and_whitespace_only(spark):
    assert toks(spark, "") == []
    assert toks(spark, "   \t  ") == []


def test_tokenize_df_shape(spark):
    df = spark.createDataFrame(
        [("d1.txt", "Hello, hello world"), ("d2.txt", "")],
        "doc string, text string",
    )
    rows = tokenize(df).collect()
    assert [(r.doc, r.word) for r in rows] == [
        ("d1.txt", "hello"),
        ("d1.txt", "hello"),
        ("d1.txt", "world"),
    ]


def test_bigram_stats_planted_conditionals(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from tf_idf_mapreduce_spark.operators.textstats import bigram_stats

    # words: a b a c a b x -> c('a')=3, bigrams "a b"x2 "a c"x1, so
    # P(b|a)=2/3, P(c|a)=1/3; c('b')=2 with "b a"x1 -> P(a|b)=1/2
    docs = [(1, "a b a c a b x", "en", "s")]
    d = tmp_path_factory.mktemp("bigrams")
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {r.bigram: (r.n_bigram, r.n_w1, r.p_cond) for r in bigram_stats(spark, str(d)).collect()}
    assert got["a b"] == (2, 3, round(2 / 3, 6))
    assert got["a c"] == (1, 3, round(1 / 3, 6))
    assert got["b a"] == (1, 2, 0.5)
