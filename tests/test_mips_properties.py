"""Property test: the norm-bound-pruned MIPS equals brute force on
arbitrary small corpora — heavy on the cases the prune must get right:
near-tied scores at the k boundary, zero vectors, all-equal weights,
corpora smaller than the probe, and negative dot products.

Inputs are integer-valued embeddings and rational stopword weights, so
score = ((s+1)/(n+1)) * dot is computed by the SAME two IEEE ops in the
operator and the reference — comparisons are exact, no tolerance."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

DIM = 4

_VECS = st.lists(
    st.tuples(
        st.tuples(*[st.integers(min_value=-2, max_value=2) for _ in range(DIM)]),
        st.integers(min_value=0, max_value=5),   # n stopwords
        st.integers(min_value=0, max_value=5),   # n junk words
    ),
    min_size=2,
    max_size=16,
)


@settings(max_examples=10, deadline=None)
@given(_VECS)
def test_mips_topk_equals_bruteforce(spark, tmp_path_factory, rows):
    from tf_idf_mapreduce_spark.operators.similarity import mips_topk

    d = str(tmp_path_factory.mktemp("mips_prop"))
    docs, embs = [], []
    for i, (vec, n_stop, n_junk) in enumerate(rows):
        text = " ".join(["the"] * n_stop + [f"junk{j}" for j in range(n_junk)])
        docs.append((i, text, "en", "web", len(text)))
        embs.append((i, [float(x) for x in vec], 0))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")

    k = 3
    got = [(r.vec_id, r.mips_score) for r in mips_topk(spark, d, 0, k).collect()]

    q = rows[0][0]
    expect = []
    for i, (vec, n_stop, n_junk) in enumerate(rows):
        if i == 0:
            continue
        w = (n_stop + 1) / (n_stop + n_junk + 1)  # (stop+1)/(words+1)
        dot = float(sum(a * b for a, b in zip(vec, q)))
        expect.append((i, round(w * dot, 6)))
    expect.sort(key=lambda t: (-t[1], t[0]))
    assert got == expect[:k]
