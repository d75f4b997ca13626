"""Unit tests for bench.py's driver plumbing (no device needed).

bench.py is the driver's primary observation surface.  These tests pin the
round-5 contract: a GLOBAL wall deadline the run enforces on itself (child
timeouts budgeted out of the remaining wall, metrics skipped with a note
when the budget runs out), the persistent host-baseline cache (CPU sides
measured once per host and reused), the run order (headline first, the DL
metric second), the derived e2e_chain_speedup line, and the tail that
re-emits every captured metric with the headline LAST on both streams.
(The metric functions themselves are exercised on real backends by
``python bench.py --metric <name>``.)
"""

import json
import subprocess

import pytest

import bench


def _side_line(name, side, value):
    return json.dumps({"metric": name, "side": side, "value": value})


@pytest.fixture(autouse=True)
def _no_sleep(monkeypatch):
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    return sleeps


@pytest.fixture(autouse=True)
def _fresh_state(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "RESULTS_JSONL", str(tmp_path / "bench_results.jsonl"))
    monkeypatch.setattr(bench, "HOST_BASELINES_JSON", str(tmp_path / "host_baselines.json"))
    monkeypatch.setattr(bench, "_DEADLINE", None)
    monkeypatch.setattr(bench, "_TAIL_DONE", False)
    monkeypatch.setattr(bench, "_install_backstop", lambda *a, **k: None)
    return tmp_path


@pytest.fixture(autouse=True)
def _jsonl(_fresh_state):
    return _fresh_state / "bench_results.jsonl"


def test_metrics_table_shape():
    names = list(bench.METRICS)
    # run order: the headline is the driver's parse target; the DL metric —
    # never landed in rounds 3/4 — runs immediately after it
    assert names[0] == bench.HEADLINE
    assert names[1] == "dl_classifier_model_epochs_per_s"
    for name, (dev_fn, host_fn, unit, timeout_s) in bench.METRICS.items():
        assert callable(dev_fn) and callable(host_fn), name
        assert isinstance(unit, str) and unit, name
        assert timeout_s >= 300, f"{name}: timeout must fit a warm-cache run"
    # the whole base budget must fit the default wall with room for retries
    assert sum(t for *_x, t in bench.METRICS.values()) <= 4 * 1500


def test_isolated_assembles_both_sides(monkeypatch, capsys):
    name = "lstm_ae_train_throughput"
    calls = []

    def fake_exec(argv, timeout_s, env):
        calls.append((argv, timeout_s, env))
        side = argv[-1]
        value = 100.0 if side == "device" else 4.0
        return 0, f"ignored preamble\n{_side_line(name, side, value)}\n", "# diag\n"

    monkeypatch.setattr(bench, "_exec_child", fake_exec)
    assert bench._run_metric_isolated(name, retries=0)
    assert [argv[-4:] for argv, _t, _e in calls] == [
        ["--metric", name, "--side", "device"],
        ["--metric", name, "--side", "host"],
    ]
    # no deadline set -> device timeout is the metric's base budget
    assert calls[0][1] == bench.METRICS[name][3]
    assert calls[0][2] is None  # device side: inherit the relay env
    host_env = calls[1][2]  # host side: strictly this machine's CPU
    assert host_env["JAX_PLATFORMS"] == "cpu"
    for v in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE", "AXON_LOOPBACK_RELAY"):
        assert v not in host_env
    out = capsys.readouterr()
    rec = json.loads(out.out.strip().splitlines()[-1])
    mfu = rec.pop("mfu")  # MXU-shaped metric: an achieved-vs-peak utilization
    assert 0.0 < mfu < 1.0
    assert rec == {"metric": name, "value": 100.0, "unit": "samples/s",
                   "vs_baseline": 25.0}
    assert "ignored preamble" not in out.out  # only the final line is printed
    assert "# diag" in out.err  # subprocess stderr is surfaced


def test_isolated_retries_device_with_doubled_timeout(monkeypatch, capsys, _no_sleep):
    name = "sigma_eval_throughput"
    base = bench.METRICS[name][3]
    timeouts = []

    def fake_exec(argv, timeout_s, env):
        timeouts.append(timeout_s)
        if argv[-1] == "device" and len(timeouts) == 1:
            raise subprocess.TimeoutExpired(argv, timeout_s, stderr="compiling...")
        return 0, _side_line(name, argv[-1], 2.0) + "\n", ""

    monkeypatch.setattr(bench, "_exec_child", fake_exec)
    assert bench._run_metric_isolated(name, retries=1)
    # device attempt 0 (base), device attempt 1 (doubled), host (base)
    assert timeouts == [base, 2 * base, base]
    assert _no_sleep == [60]  # backoff between attempts, none before the first
    err = capsys.readouterr().err
    assert "compiling..." in err  # partial stderr surfaced on timeout


def test_isolated_ignores_non_metric_braces(monkeypatch, capsys):
    name = "extraction_throughput"

    def fake_exec(argv, timeout_s, env):
        # brace-prefixed noise and a mismatched side must NOT count
        return 0, '{"progress": 1}\n' + _side_line(name, "device", 9.0) + "\n", ""

    monkeypatch.setattr(bench, "_exec_child", fake_exec)
    # host subprocess also replies with a device line -> host side fails
    assert not bench._run_metric_isolated(name, retries=0)
    out = capsys.readouterr()
    assert out.out == ""  # no fabricated metric line
    assert "no result line" in out.err


def test_isolated_exhausted_retries_returns_none(monkeypatch, capsys, _no_sleep):
    monkeypatch.setattr(bench, "_exec_child", lambda *a: (1, "", "boom\n"))
    assert not bench._run_metric_isolated("extraction_throughput", retries=2)
    assert _no_sleep == [60, 120]
    assert capsys.readouterr().out == ""


# ----------------------- global wall-budget enforcement ----------------------

def test_child_timeout_clamped_to_remaining_wall(monkeypatch):
    name = "extraction_throughput"
    timeouts = []

    def fake_exec(argv, timeout_s, env):
        timeouts.append(timeout_s)
        return 0, _side_line(name, argv[-1], 5.0) + "\n", ""

    monkeypatch.setattr(bench, "_exec_child", fake_exec)
    # 200 s left on the wall: base 480 must be clamped to 200 - TAIL_RESERVE
    monkeypatch.setattr(bench, "_DEADLINE", bench.time.monotonic() + 200.0)
    assert bench._run_side_isolated(name, "device", retries=0) == 5.0
    assert timeouts[0] == pytest.approx(200.0 - bench.TAIL_RESERVE, abs=5.0)


def test_budget_exhausted_skips_without_spawning(monkeypatch, capsys):
    spawned = []
    monkeypatch.setattr(bench, "_exec_child",
                        lambda *a: spawned.append(a) or (0, "", ""))
    # under the minimum useful child budget -> no spawn, a note instead
    monkeypatch.setattr(bench, "_DEADLINE",
                        bench.time.monotonic() + bench.TAIL_RESERVE + 10.0)
    assert bench._run_side_isolated("gbt_grid_candidates_per_s", "device", 1) is None
    assert not spawned
    assert "wall budget exhausted" in capsys.readouterr().err


def test_main_skips_trailing_metrics_when_wall_runs_out(monkeypatch, capsys):
    measured = []

    def fake_isolated(name, retries):
        measured.append(name)
        # headline consumes almost the whole wall
        if name == bench.HEADLINE:
            monkeypatch.setattr(bench, "_DEADLINE", bench.time.monotonic() + 50.0)
        return bench._emit(name, 10.0, bench.METRICS[name][2], 1.0)

    monkeypatch.setattr(bench, "_run_metric_isolated", fake_isolated)
    monkeypatch.setenv("AE_BENCH_WALL_S", "3600")
    bench.main()
    out, err = capsys.readouterr()
    assert measured == [bench.HEADLINE]  # everything after was skipped
    assert err.count("skipped: wall budget exhausted") == len(bench.METRICS) - 1
    # the tail still ends with the headline
    assert json.loads(out.strip().splitlines()[-1])["metric"] == bench.HEADLINE


# --------------------------- host-baseline cache -----------------------------

def test_host_baseline_measured_once_then_cached(monkeypatch, capsys, _fresh_state):
    name = "gbt_grid_candidates_per_s"
    spawns = []

    def fake_exec(argv, timeout_s, env):
        spawns.append(argv[-1])
        return 0, _side_line(name, "host", 1.4) + "\n", ""

    monkeypatch.setattr(bench, "_exec_child", fake_exec)
    assert bench._host_value(name) == 1.4
    assert spawns == ["host"]
    cache = json.loads((_fresh_state / "host_baselines.json").read_text())
    assert len(cache) == 1 and next(iter(cache.values()))["value"] == 1.4
    # second call: served from the cache, no child spawned
    assert bench._host_value(name) == 1.4
    assert spawns == ["host"]
    assert "cached baseline" in capsys.readouterr().err
    # force: re-measures
    assert bench._host_value(name, force=True) == 1.4
    assert spawns == ["host", "host"]


def test_host_baseline_shared_across_metrics_with_same_host_fn():
    # lstm + multi both baseline against bench_torch_cpu -> one cache entry
    assert bench._host_key("lstm_ae_train_throughput") == bench._host_key(
        "multi_ae_train_throughput")
    assert bench._host_key("lstm_ae_train_throughput") != bench._host_key(
        "conv_ae_train_throughput")


# ------------------------- derived e2e chain metric --------------------------

def _stage_records(ext=500.0, lstm=10000.0, gbt=100.0, vs=50.0):
    mk = lambda name, v: {"metric": name, "value": v, "unit": "u", "vs_baseline": vs}  # noqa: E731
    return {
        "extraction_throughput": mk("extraction_throughput", ext),
        "lstm_ae_train_throughput": mk("lstm_ae_train_throughput", lstm),
        "gbt_grid_candidates_per_s": mk("gbt_grid_candidates_per_s", gbt),
    }


def test_e2e_composes_same_run_stage_rates(capsys):
    # every stage 50x faster -> the chain is exactly 50x
    rec = bench._emit_e2e(_stage_records(vs=50.0))
    assert rec["metric"] == "e2e_chain_speedup"
    assert rec["value"] == pytest.approx(50.0, rel=1e-6)
    assert rec["vs_baseline"] == pytest.approx(50.0, rel=1e-2)
    assert rec["unit"] == "x"
    assert "stale_stages" not in rec
    assert rec["host_wall_s"] == pytest.approx(50 * rec["device_wall_s"], rel=1e-3)
    err = capsys.readouterr().err
    assert "e2e stage walls" in err  # per-stage audit line


def test_e2e_workload_weights_the_stages():
    # train stage 10x, others 100x: the composite must sit between,
    # pulled toward the slower stage's weight
    records = _stage_records()
    for n in records:
        records[n]["vs_baseline"] = 100.0
    records["lstm_ae_train_throughput"]["vs_baseline"] = 10.0
    v = bench._emit_e2e(records)["value"]
    assert 10.0 < v < 100.0


def test_e2e_falls_back_to_ledger_and_flags_stale(monkeypatch, _jsonl, capsys):
    records = _stage_records()
    stale = records.pop("gbt_grid_candidates_per_s")
    _jsonl.write_text(json.dumps(dict(stale, ts=1.0)) + "\n")
    monkeypatch.setattr(bench, "RESULTS_JSONL", str(_jsonl))
    rec = bench._emit_e2e(records)
    assert rec["stale_stages"] == ["gbt_grid_candidates_per_s"]


def test_e2e_skipped_when_a_stage_was_never_measured(capsys):
    records = _stage_records()
    records.pop("extraction_throughput")
    assert bench._emit_e2e(records) is None
    assert "e2e_chain_speedup skipped" in capsys.readouterr().err


# ------------------- main(): driver tail-line contract -----------------------
#
# The driver parses the TAIL of the run.  These tests pin the contract: every
# captured metric is re-emitted in the tail, the headline is the FINAL line of
# BOTH streams, failures only print before it, and every emitted metric also
# lands in bench_results.jsonl.

def _fake_isolated(monkeypatch, outcomes):
    """outcomes: metric name -> device value or None (failure)."""
    def fake(name, retries):
        v = outcomes.get(name)
        if v is None:
            return None
        return bench._emit(name, float(v), bench.METRICS[name][2], 1.0)
    monkeypatch.setattr(bench, "_run_metric_isolated", fake)


def test_main_reemits_all_metrics_headline_last(monkeypatch, capsys, _jsonl):
    outcomes = {n: 10.0 * i for i, n in enumerate(bench.METRICS, start=1)}
    outcomes["dl_classifier_model_epochs_per_s"] = None  # the r03 failure shape
    _fake_isolated(monkeypatch, outcomes)
    bench.main()
    out, err = capsys.readouterr()
    out_lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    tail = json.loads(out_lines[-1])
    assert tail["metric"] == bench.HEADLINE
    assert json.loads(err.strip().splitlines()[-1]) == tail  # stderr tail too
    assert "# dl_classifier_model_epochs_per_s skipped" in err
    # the tail re-emits EVERY captured metric (6 metrics + e2e), each of
    # which already printed once when measured; headline exactly twice
    metrics_seen = [json.loads(ln)["metric"] for ln in out_lines]
    assert metrics_seen.count(bench.HEADLINE) == 2
    assert set(metrics_seen) == (set(bench.METRICS) | {"e2e_chain_speedup"}) - {
        "dl_classifier_model_epochs_per_s"}
    tail_metrics = metrics_seen[-(len(bench.METRICS) - 1 + 1):]
    assert set(tail_metrics) == set(metrics_seen)  # all re-emitted in the tail
    ledger = [json.loads(ln) for ln in _jsonl.read_text().splitlines()]
    assert {r["metric"] for r in ledger} == (set(bench.METRICS) | {
        "e2e_chain_speedup"}) - {"dl_classifier_model_epochs_per_s"}
    assert all("ts" in r for r in ledger)


def test_main_headline_failure_degrades_tail_to_last_success(monkeypatch, capsys):
    outcomes = {n: 5.0 for n in bench.METRICS}
    outcomes[bench.HEADLINE] = None
    _fake_isolated(monkeypatch, outcomes)
    with pytest.raises(SystemExit):  # non-zero exit AFTER the tail line
        bench.main()
    out = capsys.readouterr().out
    tail = json.loads(out.strip().splitlines()[-1])
    assert tail["metric"] != bench.HEADLINE
    assert tail["metric"] in set(bench.METRICS) | {"e2e_chain_speedup"}


def test_main_total_failure_raises(monkeypatch, capsys):
    _fake_isolated(monkeypatch, {n: None for n in bench.METRICS})
    with pytest.raises(RuntimeError):
        bench.main()
    assert all(not ln.startswith("{") for ln in
               capsys.readouterr().out.splitlines())


def test_tail_printed_once_even_if_backstop_also_fires(capsys):
    records = {"sigma_eval_throughput": {"metric": "sigma_eval_throughput",
                                         "value": 1.0, "unit": "u",
                                         "vs_baseline": 2.0}}
    bench._print_tail(records)
    bench._print_tail(records)  # backstop double-fire must be a no-op
    out = capsys.readouterr().out
    assert out.count("sigma_eval_throughput") == 1
