"""Command-line driver mirroring the reference's entry point
(TfidfMapReduce.main, TfidfMapReduce.java:36-100): a directory of text
files in, the sorted ``word|doc TAB tfidf`` relation out.

Parity choices:
- doc identity = file basename (WordCount.java:89);
- total_docs = directory-entry count (TfidfMapReduce.java:51) — empty or
  unreadable files still raise the denominator — overridable with
  ``--total-docs`` (the per-stage CLI parity, CalcTFIDF.java:174-183);
- output format = ``key TAB value`` text with the ``word|doc`` packed key
  (TextOutputFormat, SortByValue.java:93,123), written to
  ``<output>/SortedTFIDF/`` — the reference driver's final-job directory
  (TfidfMapReduce.java:66-69), so tooling pointed at its layout finds the
  result;
- existing output: refuse unless ``--force`` (the reference interactively
  confirms then deletes, TfidfMapReduce.java:55-60 — a CLI artifact made
  non-interactive here).

Usage: ``python -m tf_idf_mapreduce_spark <input_dir> <output_dir>``
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

from .functions.tokenize import tokenize
from .operators.tfidf import doc_freq, doc_totals, tfidf, tfidf_sorted, word_count
from .session import get_spark
from .sources.io import read_text_corpus, write_kv_text


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="tf_idf_mapreduce_spark",
        description="TF-IDF over a directory of text documents (Spark-native)",
    )
    p.add_argument("input", help="directory of text files (one doc per file)")
    p.add_argument("output", help="output directory (word|doc TAB tfidf lines)")
    p.add_argument(
        "--total-docs",
        type=int,
        default=None,
        help="override the corpus size (default: input directory entry count)",
    )
    p.add_argument("--force", action="store_true", help="overwrite existing output")
    p.add_argument("--master", default=None, help="Spark master (default local[N])")
    args = p.parse_args(argv)

    if os.path.exists(args.output) and not args.force:
        print(
            f"output {args.output} exists; pass --force to overwrite",
            file=sys.stderr,
        )
        return 1

    total_docs = (
        args.total_docs
        if args.total_docs is not None
        else len(os.listdir(args.input))
    )

    spark = get_spark(app_name="tfidf-cli", master=args.master)
    lines = read_text_corpus(spark, args.input)
    scored = tfidf(
        doc_freq(doc_totals(word_count(tokenize(lines)))), F.lit(total_docs)
    )
    write_kv_text(
        tfidf_sorted(scored),
        os.path.join(args.output, "SortedTFIDF"),
        ["word", "doc"],
        "tfidf",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
