"""Retrieval surface: BM25 ranking sanity and inverted-index integrity
against an independently computed term relation. Exact values are gated by
the DuckDB oracle (scripts/oracle_check.py) — these tests pin structure
and ranking laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_idf_mapreduce_spark.functions.tokenize import tokenize
from tf_idf_mapreduce_spark.operators.retrieval import bm25_search, inverted_index
from tf_idf_mapreduce_spark.operators.tfidf import word_count
from tf_idf_mapreduce_spark.sources.io import documents_as_corpus, load_table


def _wc(spark, sf_dir):
    return word_count(
        tokenize(documents_as_corpus(load_table(spark, sf_dir, "documents")))
    )


def test_bm25_top20_is_ranked_and_positive(spark, sf_dir):
    rows = bm25_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)  # Lucene idf form can't go negative
    assert all(1 <= r.n_terms <= 5 for r in rows)


def test_bm25_prefers_the_term_heavy_doc(spark, tmp_path_factory):
    # Shared 4-word vocabulary pins the query's tie terms; "engine" (n=6)
    # dominates the top-5. Doc 10 repeats it in a short doc, doc 11 mentions
    # it once buried in filler, doc 12 never does — 10 must rank first.
    common = "aaa bbb ccc ddd"
    docs = [
        (10, "engine engine engine engine engine " + common, "en", "s"),
        (
            11,
            "engine " + " ".join(f"filler{i}" for i in range(30)) + " " + common,
            "en",
            "s",
        ),
        (12, common, "en", "s"),
    ]
    d = tmp_path_factory.mktemp("bm25")
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    rows = bm25_search(spark, str(d)).collect()
    got = {r.doc: r.bm25 for r in rows}
    assert rows[0].doc == "10"  # tf-heavy short doc wins outright
    assert got["10"] > got["11"] and got["10"] > got["12"]


def test_inverted_index_agrees_with_word_count(spark, sf_dir):
    wc = _wc(spark, sf_dir)
    idx = {r.word: r for r in inverted_index(spark, sf_dir).collect()}
    truth = {
        r.word: (r.df, r.total)
        for r in wc.groupBy("word")
        .agg(F.count("*").alias("df"), F.sum("count").alias("total"))
        .collect()
    }
    assert set(idx) == set(truth)
    for w, (df, total) in truth.items():
        row = idx[w]
        assert (row.df, row.total_tf) == (df, total)
        entries = row.postings.split(" ")
        assert len(entries) == df
        docs = [e.rsplit(":", 1)[0] for e in entries]
        assert docs == sorted(docs)  # posting list is doc-ordered
        assert sum(int(e.rsplit(":", 1)[1]) for e in entries) == total


def test_doc_similarity_pairs_are_valid_cosines(spark, sf_dir):
    from tf_idf_mapreduce_spark.operators.retrieval import (
        DOCSIM_TOP_PAIRS,
        doc_similarity,
    )

    rows = doc_similarity(spark, sf_dir).collect()
    assert 0 < len(rows) <= DOCSIM_TOP_PAIRS
    sims = [r.cosine for r in rows]
    # cosine of non-negative tf-idf vectors: (0, 1]; list is sorted desc
    assert all(0.0 < s <= 1.0 + 1e-9 for s in sims)
    assert sims == sorted(sims, reverse=True)
    # canonical orientation, no self-pairs
    assert all(r.doc_a < r.doc_b for r in rows)


def test_doc_similarity_lsh_scores_match_exact(spark, sf_dir):
    """Every pair both variants emit must carry the identical @6dp cosine
    (LSH changes WHICH pairs are scored, never the score), and the overlap
    metric must agree with a driver-side recount."""
    from tf_idf_mapreduce_spark.operators.retrieval import (
        doc_similarity,
        doc_similarity_lsh,
        doc_similarity_lsh_overlap,
    )

    def norm(rows):
        return {
            tuple(sorted((int(r.doc_a), int(r.doc_b)))): r.cosine for r in rows
        }

    exact = norm(doc_similarity(spark, sf_dir).collect())
    approx = norm(doc_similarity_lsh(spark, sf_dir).collect())
    assert approx, "LSH path found no pairs"
    both = set(exact) & set(approx)
    for pair in both:
        assert abs(exact[pair] - approx[pair]) < 1e-9, pair
    row = doc_similarity_lsh_overlap(spark, sf_dir).collect()[0]
    assert row.n_exact == len(exact)
    assert row.n_hits == len(both)


def test_doc_similarity_identical_docs_score_one(spark, tmp_path_factory):
    import pandas as pd

    from tf_idf_mapreduce_spark.operators.retrieval import doc_similarity

    d = tmp_path_factory.mktemp("docsim")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta",
                "alpha beta gamma delta",
                "unrelated words entirely different",
            ],
            "lang": ["en"] * 3,
        }
    ).to_parquet(d / "documents.parquet")
    top = doc_similarity(spark, str(d)).collect()
    assert (top[0].doc_a, top[0].doc_b) == ("1", "2")
    assert abs(top[0].cosine - 1.0) < 1e-6


def test_phrase_search_planted(spark, tmp_path):
    """Adjacency is post-normalization (reference word slots): case
    folds, digit tokens VANISH (so words around them become adjacent),
    and overlapping occurrences each count."""
    from pyspark.sql import functions as F  # noqa: F811 — local clarity

    from tf_idf_mapreduce_spark.operators.retrieval import phrase_search

    docs = [
        (0, "table hash table hash", "en", "s0", 21),   # 2 occurrences
        (1, "Table HASH!", "en", "s0", 11),             # case + trail punct
        (2, "table 123 hash", "en", "s0", 14),          # digit drop -> adjacent
        (3, "table of hash", "en", "s0", 13),           # NOT adjacent
        (4, "hash table", "en", "s0", 10),              # wrong order
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc: r.n_occurrences
        for r in phrase_search(spark, str(tmp_path)).collect()
    }
    assert got == {"0": 2, "1": 1, "2": 1}


def test_near_search_planted(spark, tmp_path):
    """NEAR/k is unordered and window-bounded: both orders count, pairs
    beyond k don't, and every phrase match is also a NEAR match."""
    from tf_idf_mapreduce_spark.operators.retrieval import (
        near_search,
        phrase_search,
    )

    docs = [
        (0, "table x hash", "en", "s0", 13),       # distance 2: within k=3
        (1, "hash x y table", "en", "s0", 14),     # reversed, distance 3
        (2, "table x y z hash", "en", "s0", 16),   # distance 4: outside
        (3, "table hash", "en", "s0", 10),         # adjacent (phrase too)
        (4, "table table hash", "en", "s0", 16),   # 2 pairs within k
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc: r.n_pairs for r in near_search(spark, str(tmp_path)).collect()
    }
    assert got == {"0": 1, "1": 1, "3": 1, "4": 2}
    phrase = {r.doc for r in phrase_search(spark, str(tmp_path)).collect()}
    assert phrase <= set(got)  # phrase matches are a subset of NEAR


def test_hybrid_search_rrf_laws(spark, sf_dir):
    """RRF output is internally consistent: scores recompute from the
    attached ranks; every row cites at least one side; both-sides rows
    dominate the score a single equal rank could give."""
    from tf_idf_mapreduce_spark.operators import retrieval as rtv

    rows = rtv.hybrid_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= rtv.HYBRID_TOP
    for r in rows:
        assert r.lex_rank is not None or r.vec_rank is not None
        expect = 0.0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= rtv.HYBRID_SIDE_K
            expect += 1.0 / (rtv.RRF_K + r.lex_rank)
        if r.vec_rank is not None:
            assert 1 <= r.vec_rank <= rtv.HYBRID_SIDE_K
            expect += 1.0 / (rtv.RRF_K + r.vec_rank)
        assert abs(r.rrf_score - round(expect, 6)) < 1e-9
    # descending, doc-tiebroken order
    keys = [(-r.rrf_score, r.doc) for r in rows]
    assert keys == sorted(keys)


def test_spell_suggest_planted_typos(spark, tmp_path):
    """Planted corpus: 'spelling' dominates, 'speling' (1 deletion) and
    'spellling' (1 insertion) are rare -> both suggest 'spelling';
    'zebra' is rare with no near neighbor -> absent; frequency breaks
    the tie between equal-distance candidates."""
    import pandas as pd

    from tf_idf_mapreduce_spark.operators.retrieval import spell_suggest

    base = ["spelling correct words here"] * 12 + ["sperling ok"] * 10
    texts = base + ["speling once", "spellling twice", "zebra alone"]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = {r.word: r for r in spell_suggest(spark, str(tmp_path)).collect()}
    assert got["speling"].suggestion == "spelling"  # dist 1 beats sperling@2
    assert got["speling"].distance == 1
    assert got["spellling"].suggestion == "spelling"
    assert got["spellling"].distance == 1
    assert "zebra" not in got
