"""Unit tests for bench.py's driver plumbing.

bench.py is the driver's primary observation surface; these tests pin the
subprocess-isolation contract (`_run_metric_isolated`) without touching a
device: the JSON metric line must be re-emitted verbatim, timeouts and
crashed attempts must be retried with backoff, and exhausted retries must
report failure instead of raising.  (The metric functions themselves are
exercised on real backends by `python bench.py --metric <name>`.)
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


def test_isolated_reemits_metric_line(monkeypatch, capsys):
    line = json.dumps({"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 2.0})
    calls = []

    def fake_run(argv, **kw):
        calls.append((argv, kw))
        return _FakeProc(stdout=f"ignored preamble\n{line}\n", stderr="# diag\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._run_metric_isolated("lstm_ae_train_throughput", retries=0)
    argv, kw = calls[0]
    assert argv[-2:] == ["--metric", "lstm_ae_train_throughput"]
    assert kw["timeout"] == bench.METRICS["lstm_ae_train_throughput"][3]
    out = capsys.readouterr()
    assert line in out.out
    assert "ignored preamble" not in out.out  # only the JSON line is forwarded
    assert "# diag" in out.err  # subprocess stderr is surfaced


def test_isolated_retries_after_timeout(monkeypatch, capsys, _no_sleep):
    line = json.dumps({"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 2.0})
    attempts = []

    def fake_run(argv, **kw):
        attempts.append(argv)
        if len(attempts) == 1:
            raise subprocess.TimeoutExpired(argv, kw["timeout"])
        return _FakeProc(stdout=line + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._run_metric_isolated("sigma_eval_throughput", retries=1)
    assert len(attempts) == 2
    assert _no_sleep == [60]  # backoff between attempts, none before the first
    assert line in capsys.readouterr().out


def test_isolated_exhausted_retries_returns_false(monkeypatch, capsys, _no_sleep):
    def fake_run(argv, **kw):
        return _FakeProc(stdout="", stderr="boom\n", returncode=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert not bench._run_metric_isolated("extraction_throughput", retries=2)
    assert _no_sleep == [60, 120]
    assert capsys.readouterr().out == ""  # no fabricated metric line
