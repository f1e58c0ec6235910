from .tfidf import (
    doc_freq,
    doc_totals,
    tfidf,
    tfidf_pipeline,
    tfidf_sorted,
    word_count,
)

__all__ = [
    "doc_freq",
    "doc_totals",
    "tfidf",
    "tfidf_pipeline",
    "tfidf_sorted",
    "word_count",
]
