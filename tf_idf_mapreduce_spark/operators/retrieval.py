"""Retrieval operators on the scored term relation — BM25 ranking and
inverted-index (postings) construction.

These extend the reference's TF-IDF pipeline (TfidfMapReduce.java:63-97 —
tokenize → word count → doc totals → df → score) with the two surfaces a
search engine actually serves from: a BM25 ranker (the modern default the
reference's TF-IDF approximates) and the materialized inverted index.

Scale design:
- Both operators reuse the tokenizer's single scan; corpus-level scalars
  (N, avgdl) enter the plan as broadcast 1-row aggregates, never a
  ``.collect()``.
- The postings build is one shuffle on ``word`` with map-side partial
  ``collect_list``; the posting payload is a compact string, so the wide
  row never exceeds the df of the hottest term. At 100 TB you'd bucket the
  output table by word (see sources/io table sinks) so lookups prune.
- BM25's per-term work is pure Column arithmetic inside whole-stage
  codegen; the 5-term query side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize
from ..sources.io import documents_as_corpus, load_table
from .tfidf import doc_freq, doc_totals, tfidf_pipeline, word_count

#: Standard BM25 free parameters (Robertson et al., TREC-3).
BM25_K1 = 1.2
BM25_B = 0.75

#: Terms kept per document vector in ``doc_similarity`` (the standard
#: sparse-vector pruning: everything below a doc's top-K tf-idf weights
#: contributes noise, and K bounds the self-join fanout).
DOCSIM_TOP_TERMS = 10
#: Result size of ``doc_similarity``.
DOCSIM_TOP_PAIRS = 20


def _scored_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, doc, count, doc_total, df) — the reference pipeline's jobs
    1-3 over the documents corpus."""
    docs = documents_as_corpus(load_table(spark, sf_dir, "documents"))
    return doc_freq(doc_totals(word_count(tokenize(docs))))


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 docs for the corpus's 5 most frequent terms (the same
    self-contained query shape as ``tfidf_search``).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene/ATIRE form —
    always positive, so stopword-frequency terms can't flip sign).

    N and avgdl are broadcast 1-row aggregates; per-term contributions are
    rounded @6dp before the sum (cross-engine determinism, see
    __spark_entry__ header).
    """
    wtd = _scored_terms(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    avgdl = (
        wtd.select("doc", "doc_total")
        .distinct()
        .agg(F.avg("doc_total").alias("avgdl"))
    )
    terms = (
        wtd.groupBy("word")
        .agg(F.sum("count").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(5)
        .select("word")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_norm = (F.col("count") * (BM25_K1 + 1)) / (
        F.col("count")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("doc_total") / F.col("avgdl"))
    )
    contrib = F.round(idf * tf_norm, 6)
    return (
        wtd.join(F.broadcast(terms), "word")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .select("doc", contrib.alias("contrib"))
        .groupBy("doc")
        .agg(
            F.round(F.sum("contrib"), 6).alias("bm25"),
            F.count("*").alias("n_terms"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc"))
        .limit(20)
    )


def doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs document cosine similarity over pruned TF-IDF vectors —
    top ``DOCSIM_TOP_PAIRS`` most-similar document pairs.

    Each doc keeps its ``DOCSIM_TOP_TERMS`` highest-weighted terms (ties
    broken by word — deterministic), then pairs meet through a sparse
    self-join on ``word``: sim(a,b) = Σ w_a·w_b / (‖a‖·‖b‖).

    Scale design: the top-K pruning is what makes this survive 100 TB —
    the self-join fanout per word is bounded by the number of docs whose
    top-K contains that word, and near-stopwords (idf→0) prune themselves
    out, so the hottest join keys disappear instead of exploding
    quadratically. The join shuffles on ``word`` (K rows per doc, not the
    full posting list); norms re-enter by a join on ``doc`` AQE can turn
    into a broadcast. Weights are rounded @6dp *before* the dot product so
    this and the SQL oracle sum identical values (same convention as
    ``bm25_search``'s contrib).

    The pruned vector relation is consumed three times (both self-join
    sides + norms); ``localCheckpoint`` materializes it once — K rows per
    doc — instead of re-running the tokenize→tf-idf DAG per branch (same
    pattern as dedup's shared shingle table). At 100 TB you'd persist the
    pruned-vectors table and build pairs from it incrementally.
    """
    docs = documents_as_corpus(load_table(spark, sf_dir, "documents"))
    scored = tfidf_pipeline(docs)
    wts = scored.select("word", "doc", F.round("tfidf", 6).alias("wt"))
    top = Window.partitionBy("doc").orderBy(F.desc("wt"), F.asc("word"))
    vec = (
        wts.withColumn("rn", F.row_number().over(top))
        .filter(F.col("rn") <= DOCSIM_TOP_TERMS)
        .drop("rn")
        .localCheckpoint()
    )
    norms = vec.groupBy("doc").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
    )
    a, b = vec.alias("a"), vec.alias("b")
    dots = (
        a.join(b, "word")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
        .agg(F.sum(F.col("a.wt") * F.col("b.wt")).alias("dot"))
    )
    na = norms.select(
        F.col("doc").alias("doc_a"), F.col("nrm").alias("nrm_a")
    )
    nb = norms.select(
        F.col("doc").alias("doc_b"), F.col("nrm").alias("nrm_b")
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(DOCSIM_TOP_PAIRS)
    )


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index: per word its df, corpus-wide term
    frequency, and the posting list rendered ``doc:tf doc:tf …`` ordered by
    doc id (string order — engine-portable).

    One shuffle on ``word``; ``collect_list`` partial-aggregates map-side,
    so the exchange carries per-word partial postings, and the final string
    render is a pure Column expression. The string payload (not
    array<struct>) is deliberate: it makes the relation hashable by any
    engine and is the on-disk shape a posting store would serve.
    """
    wc = word_count(
        tokenize(documents_as_corpus(load_table(spark, sf_dir, "documents")))
    )
    postings = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc", "count"))),
            lambda s: F.concat_ws(":", s["doc"], s["count"]),
        ),
        " ",
    )
    return wc.groupBy("word").agg(
        F.count("*").alias("df"),
        F.sum("count").alias("total_tf"),
        postings.alias("postings"),
    )
