"""bench.py perf-regression guard: fresh step_ms vs the last BENCH_r*.json
(VERDICT r3 item 7 — a kernel change must not silently eat prior gains)."""

import json

import bench


def _write(tmp_path, rnd, step_ms, parsed=True):
    body = {"n": rnd}
    if parsed:
        body["parsed"] = {"step_ms": step_ms}
    (tmp_path / f"BENCH_r{rnd:02d}.json").write_text(json.dumps(body))


class TestBenchRegressionGuard:
    def test_picks_latest_round(self, tmp_path):
        _write(tmp_path, 2, 34.3)
        _write(tmp_path, 3, 21.4)
        pct, prior, fname = bench._regression_vs_last(23.54, str(tmp_path))
        assert fname == "BENCH_r03.json"
        assert prior == 21.4
        assert pct == 10.0  # (23.54/21.4 - 1) * 100

    def test_faster_is_negative(self, tmp_path):
        _write(tmp_path, 3, 21.4)
        pct, _, _ = bench._regression_vs_last(19.26, str(tmp_path))
        assert pct == -10.0

    def test_no_priors(self, tmp_path):
        assert bench._regression_vs_last(20.0, str(tmp_path)) == (None, None, None)

    def test_malformed_records_skipped(self, tmp_path):
        (tmp_path / "BENCH_r04.json").write_text("not json")
        _write(tmp_path, 5, step_ms=0.0)       # zero prior: unusable
        _write(tmp_path, 3, 21.4)
        pct, prior, fname = bench._regression_vs_last(21.4, str(tmp_path))
        # r05 parsed but zero -> latest USABLE record wins... the guard keeps
        # the newest round regardless and rejects it only on <=0, so here the
        # newest well-formed round (5) is unusable and the guard reports none
        assert (pct, prior, fname) == (None, None, None)

    def test_unparsed_tail_skipped(self, tmp_path):
        _write(tmp_path, 6, None, parsed=False)
        _write(tmp_path, 3, 21.4)
        pct, prior, fname = bench._regression_vs_last(42.8, str(tmp_path))
        assert fname == "BENCH_r03.json"
        assert pct == 100.0
