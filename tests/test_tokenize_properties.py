"""Property tests: the codegen row-level tokenizer and the array-level
tokenizer are the same function, and both respect the reference's output
invariants on arbitrary input."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tf_idf_mapreduce_spark.functions.tokenize import tokenize, tokenize_text

# Text that exercises the tokenizer's edge machinery: entities (whole and
# split), tags, punctuation runs, digits, mixed whitespace, unicode.
_CHUNKS = st.sampled_from(
    [
        "hello", "WORLD", "don't", "u.s.a", "re-do", "abc123", "$5", "42",
        "&amp;", "&lt;b&gt;", "&nbsp;", "&amp;lt;", "<div>", "<b>x</b>",
        "...", "--", "=>", "<<>>", "¡hola!", "héllo", "ça", "'quoted'",
        " ", "\t", "\n", "\r", "\f", "", "|", "a|b", "$+-=",
    ]
)
_TEXTS = st.lists(_CHUNKS, min_size=0, max_size=12).map("".join)


@settings(max_examples=20, deadline=None)
@given(st.lists(_TEXTS, min_size=1, max_size=8))
def test_row_and_array_formulations_agree(spark, texts):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc string, text string"
    )
    via_rows = [
        (r.doc, r.word) for r in tokenize(df).collect()
    ]
    via_array = [
        (r.doc, r.word)
        for r in df.select(
            "doc", F.explode(tokenize_text(F.col("text"))).alias("word")
        ).collect()
    ]
    assert sorted(via_rows) == sorted(via_array)


@settings(max_examples=20, deadline=None)
@given(_TEXTS)
def test_output_word_invariants(spark, text):
    df = spark.createDataFrame([("d", text)], "doc string, text string")
    words = [r.word for r in tokenize(df).collect()]
    for w in words:
        assert w != ""
        assert w == w.lower()
        assert not re.search(r"[ \t\n\r\f]", w)
        assert not re.search(r"\d", w)  # digit tokens are dropped whole
