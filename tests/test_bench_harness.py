"""bench.py harness contracts (round-7 review): the summary line stays
parseable under mass failure, and a failed --check never rewrites its
own baseline.  Pure-Python — no SparkSession."""

from __future__ import annotations

import json

import bench


def test_summary_line_fits_budget_even_when_most_queries_fail():
    """A broken session fails ~all queries; the line must still fit the
    driver's 2000-char stdout-tail capture and stay parseable, with
    n_failed carrying the count once names fall off."""
    timings = {f"query_with_a_rather_long_name_{i:03d}": -1.0 for i in range(100)}
    timings.update({f"ok_query_{i:03d}": 0.5 + i / 100 for i in range(16)})
    line = bench.summary_line(timings, 0.1)
    assert len(line) <= bench._LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["n_queries"] == 116
    assert parsed["n_failed"] == 100
    assert parsed["value"] > 0  # failures excluded from the total


def test_summary_line_keeps_all_queries_when_they_fit():
    timings = {"q1": 1.0, "q2": -1.0, "q3": 0.25}
    parsed = json.loads(bench.summary_line(timings, 0.01))
    assert set(parsed["queries"]) == {"q1", "q2", "q3"}
    assert parsed["n_failed"] == 1
    assert parsed["value"] == 1.25


def test_failed_check_does_not_rewrite_baseline(tmp_path, monkeypatch, capsys):
    """--check exiting 1 must leave BENCH_FULL.json at the baseline:
    rewriting it with the regressed numbers would make a naive re-run
    compare against the regression and print OK."""
    baseline = {"sf": 0.1, "queries": {"q1": 1.0, "q2": 1.0}}
    full = tmp_path / "BENCH_FULL.json"
    full.write_text(json.dumps(baseline))
    monkeypatch.setattr(bench, "FULL_PATH", str(full))
    # q1 regresses past the double gate (>1.5x AND >0.5s)
    monkeypatch.setattr(bench, "run_bench", lambda only: ({"q1": 3.0, "q2": 1.0}, 0.1))
    monkeypatch.setattr("sys.argv", ["bench.py", "--check"])
    try:
        bench.main()
        raised = 0
    except SystemExit as e:
        raised = e.code
    assert raised == 1
    assert json.loads(full.read_text()) == baseline  # untouched

    # and a PASSING run does refresh the baseline
    monkeypatch.setattr(bench, "run_bench", lambda only: ({"q1": 1.1, "q2": 0.9}, 0.1))
    try:
        bench.main()
        raised = 0
    except SystemExit as e:
        raised = e.code
    assert raised == 0
    assert json.loads(full.read_text())["queries"] == {"q1": 1.1, "q2": 0.9}
