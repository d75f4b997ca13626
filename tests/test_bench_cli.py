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
