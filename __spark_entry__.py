"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TF-IDF pipeline at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
LLM-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for the sf0.01 correctness gate.

Cross-engine determinism rules used throughout (see SURVEY.md §5):

- Integer-valued columns (counts, totals, df) are exact in both engines —
  emitted unrounded. DuckDB aggregate results are cast to BIGINT in the
  oracle because DuckDB widens sums to HUGEINT while Spark stays int64.
- Floating-point derived columns are rounded to 6 decimals on BOTH sides:
  Spark's ``F.log`` is StrictMath.log while DuckDB's ``ln`` is the platform
  libm — they differ by ~1 ulp, so raw doubles would hash-mismatch. At 6
  decimals the flip probability per value is ~1e-10.
- Double SUMs over many rows are order-dependent; where a query needs an
  additive double aggregate both sides cast to DECIMAL first (exact,
  order-independent) and round at the end.
- Every computed column is aliased identically in the Spark code and the
  SQL (the driver's compare is by column name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_mapreduce_spark.operators.tfidf import (
    doc_freq,
    doc_totals,
    tfidf_pipeline,
    tfidf_sorted,
    word_count,
)
from tf_idf_mapreduce_spark.functions.tokenize import tokenize
from tf_idf_mapreduce_spark.plans.pipeline import flagship_tfidf
from tf_idf_mapreduce_spark.sources.io import documents_as_corpus, load_table


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TF-IDF over sf0.001 documents, sorted desc."""
    return flagship_tfidf(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return documents_as_corpus(load_table(spark, sf_dir, "documents"))


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenize(_corpus(spark, sf_dir))


# --------------------------------------------------------------------------
# TF-IDF family (SURVEY.md §2.2-2.6 — the reference's own pipeline)
# --------------------------------------------------------------------------

def q_tfidf_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 1 (A1): (word, doc, count)."""
    return word_count(_tokens(spark, sf_dir))


def q_tfidf_doc_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 2 (A2): + per-doc total words."""
    return doc_totals(q_tfidf_word_count(spark, sf_dir))


def q_tfidf_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 3a (A3): + document frequency."""
    return doc_freq(q_tfidf_doc_totals(spark, sf_dir))


def q_tfidf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jobs 1-4 (M1-M3 + O3): full scored relation, tfidf rounded @6dp."""
    scored = tfidf_pipeline(_corpus(spark, sf_dir))
    return scored.select(
        "word",
        "doc",
        "count",
        "doc_total",
        "df",
        F.round("tfidf", 6).alias("tfidf"),
    )


def q_tfidf_top30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 extension: global top-30 by score (reference README's golden head
    shape, README.md:321-356), deterministic tiebreaks on rounded score."""
    return (
        q_tfidf_full(spark, sf_dir)
        .orderBy(F.desc("tfidf"), F.asc("word"), F.asc("doc"))
        .limit(30)
    )


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------

# The reference tokenizer (WordCount.java:61-85) in DuckDB SQL. RE2's \pP
# and Java's \pP agree on the fixture corpus (ASCII); StringTokenizer's
# delimiter set is exactly " \t\n\r\f".
_TOKENS_CTE = r"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc, text FROM documents
),
outer_toks AS (
  SELECT doc, unnest(regexp_split_to_array(text, '[ \t\n\r\f]+')) AS tok
  FROM corpus
),
std AS (
  SELECT doc, lower(
    regexp_replace(
    regexp_replace(
    regexp_replace(
      replace(replace(replace(replace(replace(replace(
        CASE WHEN regexp_matches(tok, '\d') THEN '' ELSE tok END,
        '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
        '&quot;', '"'), '&apos;', ''''), '&nbsp;', ' '),
      '<[^>]+>', '', 'g'),
      '^[\pP$+\-=<>]+', ''),
      '[\pP$+\-=<>]+$', '')
  ) AS std
  FROM outer_toks WHERE tok <> ''
),
inner_toks AS (
  SELECT doc, unnest(regexp_split_to_array(std, '[ \t\n\r\f]+')) AS word
  FROM std
),
tokens AS (
  SELECT doc, word FROM inner_toks WHERE word <> ''
),
wc AS (
  SELECT word, doc, CAST(count(*) AS BIGINT) AS "count"
  FROM tokens GROUP BY word, doc
),
wc_tot AS (
  SELECT word, doc, "count",
         CAST(sum("count") OVER (PARTITION BY doc) AS BIGINT) AS doc_total
  FROM wc
),
wc_df AS (
  SELECT word, doc, "count", doc_total,
         CAST(count(*) OVER (PARTITION BY word) AS BIGINT) AS df
  FROM wc_tot
),
scored AS (
  SELECT word, doc, "count", doc_total, df,
         round(
           (CAST("count" AS DOUBLE) / doc_total)
           * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df),
         6) AS tfidf
  FROM wc_df
)
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tfidf_word_count": q_tfidf_word_count,
        "tfidf_doc_totals": q_tfidf_doc_totals,
        "tfidf_doc_freq": q_tfidf_doc_freq,
        "tfidf_full": q_tfidf_full,
        "tfidf_top30": q_tfidf_top30,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tfidf_word_count": _TOKENS_CTE + 'SELECT word, doc, "count" FROM wc',
        "tfidf_doc_totals": _TOKENS_CTE
        + 'SELECT word, doc, "count", doc_total FROM wc_tot',
        "tfidf_doc_freq": _TOKENS_CTE
        + 'SELECT word, doc, "count", doc_total, df FROM wc_df',
        "tfidf_full": _TOKENS_CTE
        + 'SELECT word, doc, "count", doc_total, df, tfidf FROM scored',
        "tfidf_top30": _TOKENS_CTE
        + 'SELECT word, doc, "count", doc_total, df, tfidf FROM scored '
        + "ORDER BY tfidf DESC, word ASC, doc ASC LIMIT 30",
    }
