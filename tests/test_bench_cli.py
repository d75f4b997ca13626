"""Unit tests for bench.py's driver plumbing.

bench.py is the driver's primary observation surface; these tests pin the
subprocess-isolation contract without touching a device: the device side is
retried with a doubled timeout (a cold compile killed at the base budget
must fit once on retry), the deterministic CPU baseline runs separately so
a baseline failure never discards a completed device measurement, result
lines are matched exactly (not any brace-prefixed stdout), and exhausted
retries report failure instead of raising.  (The metric functions
themselves are exercised on real backends by
``python bench.py --metric <name>``.)
"""

import json
import subprocess

import pytest

import bench


class _FakeProc:
    def __init__(self, stdout="", stderr="", returncode=0):
        self.stdout = stdout
        self.stderr = stderr
        self.returncode = returncode


def _side_line(name, side, value):
    return json.dumps({"metric": name, "side": side, "value": value})


@pytest.fixture(autouse=True)
def _no_sleep(monkeypatch):
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    return sleeps


@pytest.fixture(autouse=True)
def _jsonl(tmp_path, monkeypatch):
    path = tmp_path / "bench_results.jsonl"
    monkeypatch.setattr(bench, "RESULTS_JSONL", str(path))
    return path


def test_metrics_table_shape():
    for name, (dev_fn, host_fn, unit, timeout_s) in bench.METRICS.items():
        assert callable(dev_fn) and callable(host_fn), name
        assert isinstance(unit, str) and unit, name
        assert timeout_s >= 600, f"{name}: timeout must fit a cold relay compile"


def test_isolated_assembles_both_sides(monkeypatch, capsys):
    name = "lstm_ae_train_throughput"
    calls = []

    def fake_run(argv, **kw):
        calls.append((argv, kw))
        side = argv[-1]
        value = 100.0 if side == "device" else 4.0
        return _FakeProc(
            stdout=f"ignored preamble\n{_side_line(name, side, value)}\n",
            stderr="# diag\n",
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._run_metric_isolated(name, retries=0)
    assert [argv[-4:] for argv, _ in calls] == [
        ["--metric", name, "--side", "device"],
        ["--metric", name, "--side", "host"],
    ]
    assert calls[0][1]["timeout"] == bench.METRICS[name][3]
    assert calls[0][1]["env"] is None  # device side: inherit the relay env
    host_env = calls[1][1]["env"]  # host side: strictly this machine's CPU
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

    def fake_run(argv, **kw):
        timeouts.append(kw["timeout"])
        if argv[-1] == "device" and len(timeouts) == 1:
            raise subprocess.TimeoutExpired(argv, kw["timeout"], stderr="compiling...")
        return _side_line(name, argv[-1], 2.0) and _FakeProc(
            stdout=_side_line(name, argv[-1], 2.0) + "\n"
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._run_metric_isolated(name, retries=1)
    # device attempt 0 (base), device attempt 1 (doubled), host (base)
    assert timeouts == [base, 2 * base, base]
    assert _no_sleep == [60]  # backoff between attempts, none before the first
    err = capsys.readouterr().err
    assert "compiling..." in err  # partial stderr surfaced on timeout


def test_isolated_ignores_non_metric_braces(monkeypatch, capsys):
    name = "extraction_throughput"

    def fake_run(argv, **kw):
        # brace-prefixed noise and a mismatched side must NOT count
        return _FakeProc(stdout='{"progress": 1}\n'
                         + _side_line(name, "device", 9.0) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    # host subprocess also replies with a device line -> host side fails
    assert not bench._run_metric_isolated(name, retries=0)
    out = capsys.readouterr()
    assert out.out == ""  # no fabricated metric line
    assert "no result line" in out.err


def test_isolated_exhausted_retries_returns_false(monkeypatch, capsys, _no_sleep):
    def fake_run(argv, **kw):
        return _FakeProc(stdout="", stderr="boom\n", returncode=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert not bench._run_metric_isolated("extraction_throughput", retries=2)
    assert _no_sleep == [60, 120]
    assert capsys.readouterr().out == ""


# ------------------- main(): driver tail-line contract -----------------------
#
# The driver parses the TAIL of the run (BENCH_r03 recorded `parsed: null`
# because a failed metric's note printed after the headline).  These tests pin
# the contract: the headline line is re-emitted as the FINAL line of BOTH
# streams, failures only print before it, and every emitted metric also lands
# in bench_results.jsonl.

def _fake_isolated(monkeypatch, outcomes):
    """outcomes: metric name -> device value or None (failure)."""
    def fake(name, side, retries):
        v = outcomes.get(name)
        if v is None:
            return None
        return float(v) if side == "device" else 1.0
    monkeypatch.setattr(bench, "_run_side_isolated", fake)


def test_main_reemits_headline_last_even_after_failures(monkeypatch, capsys, _jsonl):
    outcomes = {n: 10.0 * i for i, n in enumerate(bench.METRICS, start=1)}
    outcomes["dl_classifier_model_epochs_per_s"] = None  # the r03 failure shape
    _fake_isolated(monkeypatch, outcomes)
    bench.main()
    out, err = capsys.readouterr()
    out_lines = out.strip().splitlines()
    tail = json.loads(out_lines[-1])
    assert tail["metric"] == bench.HEADLINE
    assert json.loads(err.strip().splitlines()[-1]) == tail  # stderr tail too
    assert "# dl_classifier_model_epochs_per_s skipped" in err
    # headline appears twice: once when measured, once as the tail line
    assert sum(json.loads(ln)["metric"] == bench.HEADLINE
               for ln in out_lines if ln.startswith("{")) == 2
    ledger = [json.loads(ln) for ln in _jsonl.read_text().splitlines()]
    assert {r["metric"] for r in ledger} == set(bench.METRICS) - {
        "dl_classifier_model_epochs_per_s"}
    assert all("ts" in r for r in ledger)


def test_main_headline_failure_degrades_tail_to_last_success(monkeypatch, capsys):
    outcomes = {n: 5.0 for n in bench.METRICS}
    outcomes[bench.HEADLINE] = None
    _fake_isolated(monkeypatch, outcomes)
    with pytest.raises(SystemExit):  # non-zero exit AFTER the tail line
        bench.main()
    out = capsys.readouterr().out
    tail = json.loads(out.strip().splitlines()[-1])
    assert tail["metric"] in bench.METRICS and tail["metric"] != bench.HEADLINE


def test_main_total_failure_raises(monkeypatch, capsys):
    _fake_isolated(monkeypatch, {n: None for n in bench.METRICS})
    with pytest.raises(RuntimeError):
        bench.main()
    assert all(not ln.startswith("{") for ln in
               capsys.readouterr().out.splitlines())
