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


def test_adaptive_third_pass_fires_only_on_disagreement():
    """Two agreeing passes stay at 2; a >1.5x disagreement draws a
    third (VERDICT r7 #6), so one fluke pass can't own the min."""
    def clock_seq(durations):
        # perf_counter values: t0, t1 per pass
        ticks, t = [], 0.0
        for d in durations:
            ticks += [t, t + d]
            t += d
        it = iter(ticks)
        return lambda: next(it)

    calls = []
    passes = bench.adaptive_passes(
        lambda: calls.append(1), clock=clock_seq([1.0, 1.1])
    )
    assert len(passes) == 2 and len(calls) == 2

    calls = []
    passes = bench.adaptive_passes(
        lambda: calls.append(1), clock=clock_seq([4.8, 1.0, 1.05])
    )
    assert len(passes) == 3 and len(calls) == 3
    best = sorted(passes)
    assert best[0] == 1.0
    assert round(best[1] / best[0], 3) == 1.05  # residual spread,
    # not the 4.8x the adjudicated outlier would re-introduce


def test_failed_check_does_not_rewrite_baseline(tmp_path, monkeypatch, capsys):
    """--check exiting 1 must leave BENCH_FULL.json at the baseline:
    rewriting it with the regressed numbers would make a naive re-run
    compare against the regression and print OK."""
    baseline = {"sf": 0.1, "queries": {"q1": 1.0, "q2": 1.0}}
    full = tmp_path / "BENCH_FULL.json"
    full.write_text(json.dumps(baseline))
    monkeypatch.setattr(bench, "FULL_PATH", str(full))
    # q1 regresses past the double gate (>1.5x AND >0.5s)
    def fake_run(t):
        return lambda only: (
            {"timings": t, "spread": {k: 1.0 for k in t}, "passes": {k: 2 for k in t}},
            0.1,
        )

    monkeypatch.setattr(bench, "run_bench", fake_run({"q1": 3.0, "q2": 1.0}))
    monkeypatch.setattr("sys.argv", ["bench.py", "--check"])
    try:
        bench.main()
        raised = 0
    except SystemExit as e:
        raised = e.code
    assert raised == 1
    assert json.loads(full.read_text()) == baseline  # untouched

    # and a PASSING run does refresh the baseline — now with the
    # round-8 spread/passes fields for mechanical noise discounting
    monkeypatch.setattr(bench, "run_bench", fake_run({"q1": 1.1, "q2": 0.9}))
    try:
        bench.main()
        raised = 0
    except SystemExit as e:
        raised = e.code
    assert raised == 0
    refreshed = json.loads(full.read_text())
    assert refreshed["queries"] == {"q1": 1.1, "q2": 0.9}
    assert refreshed["spread"] == {"q1": 1.0, "q2": 1.0}
    assert refreshed["passes"] == {"q1": 2, "q2": 2}
    assert refreshed["protocol"] == "min-of-2-adaptive-3"
