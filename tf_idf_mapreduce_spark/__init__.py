"""tf_idf_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first reimplementation of the capabilities of the
reference repo NZJ-Jimmy/TF-IDF_MapReduce (a 4-job Hadoop MapReduce TF-IDF
pipeline), extended with the relational and LLM-data-pipeline operators a
100 TB training-data platform needs.

Layout
------
- ``session``    : SparkSession factory tuned for scale (AQE, Arrow, shuffle sizing)
- ``sources``    : loaders/sinks (parquet fixture tables, raw text corpora, KV text)
- ``functions``  : pure Column-expression libraries (tokenizer, hashing, vectors,
                   text statistics) — JVM-side, codegen-friendly, no Python UDFs
                   in the hot path
- ``operators``  : composable DataFrame transforms (tfidf stages, relational
                   surface, dedup, similarity, sessionization, multimodal)
- ``plans``      : end-to-end pipelines (the flagship TF-IDF query)
- ``streaming``  : Structured Streaming variants (windowed aggregation,
                   stateful sessionization)

The reference's semantics are pinned in SURVEY.md; docstrings here cite
reference files as ``WordCount.java:63`` etc. for parity checking.
"""

__version__ = "0.1.0"
