"""The CLI entry point: reference-parity end-to-end run on real files."""

from __future__ import annotations

import math

from tf_idf_mapreduce_spark.cli import main


def _run(tmp_path, extra=()):
    inp = tmp_path / "input"
    inp.mkdir(exist_ok=True)
    (inp / "a.txt").write_text("spark spark engine")
    (inp / "b.txt").write_text("engine room")
    (inp / "empty.txt").write_text("")  # still counts toward total_docs
    out = tmp_path / "out"
    rc = main([str(inp), str(out), *extra])
    lines = []
    # reference driver layout: final job writes <output>/SortedTFIDF/
    # (TfidfMapReduce.java:66-69)
    for part in (out / "SortedTFIDF").glob("part-*"):
        lines += [l for l in part.read_text().splitlines() if l]
    return rc, dict(
        (tuple(l.split("\t")[0].split("|")), float(l.split("\t")[1])) for l in lines
    )


def test_cli_end_to_end(tmp_path):
    rc, scores = _run(tmp_path)
    assert rc == 0
    # total_docs = 3 directory entries (empty.txt counts: TfidfMapReduce.java:51)
    # spark: tf=2/3 in a.txt, df=1 -> ln(3/1)
    assert math.isclose(scores[("spark", "a.txt")], 2 / 3 * math.log(3), rel_tol=1e-12)
    # engine: df=2 -> ln(3/2)
    assert math.isclose(scores[("engine", "a.txt")], 1 / 3 * math.log(3 / 2), rel_tol=1e-12)
    assert math.isclose(scores[("room", "b.txt")], 1 / 2 * math.log(3), rel_tol=1e-12)


def test_cli_refuses_existing_output_without_force(tmp_path):
    rc1, _ = _run(tmp_path)
    assert rc1 == 0
    out = tmp_path / "out"
    assert out.exists()
    rc2 = main([str(tmp_path / "input"), str(out)])
    assert rc2 == 1
    rc3, scores = _run(tmp_path, extra=["--force"])
    assert rc3 == 0 and scores


def test_cli_total_docs_override(tmp_path):
    rc, scores = _run(tmp_path, extra=["--force", "--total-docs", "10"])
    assert rc == 0
    assert math.isclose(scores[("room", "b.txt")], 1 / 2 * math.log(10 / 1), rel_tol=1e-12)
