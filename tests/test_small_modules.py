"""Direct coverage for the small support modules: LHS sampling, the model
registry, logging/tracker channels, profiling timers, and the gated
VitalDB adapter's offline behavior."""

import csv
import json
import os

import jax
import numpy as np
import pytest


def test_lhs_param_ranges_and_grid_contract():
    from ae_waveforms_tpu.classify.lhs import generate_lhs_params, lhs_param_dicts

    params = lhs_param_dicts(200, random_state=1)
    assert len(params) == 200
    for p in params:
        assert 2 <= p["max_depth"] <= 10
        assert 0.01 <= p["learning_rate"] <= 0.3
        assert p["n_estimators"] in set(range(50, 551, 50))
        assert 0.0 <= p["gamma"] <= 5.0
        assert 1 <= p["min_child_weight"] <= 11
        assert 0.5 <= p["subsample"] <= 1.0
        assert 0.5 <= p["colsample_bytree"] <= 1.0
    # LHS stratification: each of the 9 depth cells is hit at 200 samples
    assert {p["max_depth"] for p in params} == set(range(2, 11))
    # deterministic under a seed
    assert lhs_param_dicts(10, random_state=7) == lhs_param_dicts(10, random_state=7)
    # GridSearchCV-style single-point grids (reference return contract)
    grids = generate_lhs_params(3, random_state=0)
    assert all(isinstance(v, list) and len(v) == 1 for g in grids for v in g.values())


def test_registry_builds_both_models_and_rejects_unknown():
    from ae_waveforms_tpu.models.registry import MODEL_REGISTRY, build_model, input_layout

    assert set(MODEL_REGISTRY) == {"LSTMAutoencoder", "LeNet5AutoencoderAvgPool"}
    key = jax.random.PRNGKey(0)
    for name, mdef in MODEL_REGISTRY.items():
        _, params = build_model(name, key, latent_size=4)
        B, L = 2, 320
        x = np.zeros((B, 1, L) if mdef.channel_first else (B, L, 1), np.float32)
        out = mdef.forward(params, x)
        assert out.shape == x.shape
        z = mdef.encode(params, x)
        assert z.shape[0] == B and 4 in z.shape
        assert input_layout(name) == mdef.channel_first
    with pytest.raises(ValueError, match="unknown model class"):
        build_model("ResNet", key, latent_size=4)


def test_csv_logs_and_jsonl_tracker(tmp_path):
    from ae_waveforms_tpu.train.logs import CsvLogs, JsonlTracker, make_tracker

    d = str(tmp_path)
    logs = CsvLogs(d)
    logs.train_step(0, 10, 1e-3, 0.5)
    logs.train_step(0, 20, 1e-3, 0.4)
    logs.validation(0, 20, 1e-3, 0.4, 0.45)  # flushes buffered train rows
    with open(os.path.join(d, "training_log.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2 and rows[1][:2] == ["0", "20"]
    with open(os.path.join(d, "training_log_validation.csv")) as f:
        vrows = list(csv.reader(f))
    assert vrows == [["0", "20", "0.001", "0.4", "0.45"]]

    tr = JsonlTracker(d, tags=["unit"], flush_every=4)
    for i in range(6):
        tr.log("Train Loss", float(i))
    tr.close()
    recs = [json.loads(line) for line in open(os.path.join(d, "run.jsonl"))]
    assert recs[0]["stream"] == "tags"
    assert [r["value"] for r in recs if r["stream"] == "Train Loss"] == [0, 1, 2, 3, 4, 5]

    assert make_tracker(None, d).__class__.__name__ == "_NoopTracker"
    assert isinstance(make_tracker("jsonl", d), JsonlTracker)


def test_neptune_tracker_against_mock_client(tmp_path, monkeypatch):
    """The NeptuneTracker adapter (reference channel: run_train.py:394-407,
    :513-517) can never run for real here (no client, no credentials), so
    exercise it against a faithful mock of the neptune API surface it uses:
    ``init_run(project, api_token, tags)``, ``run[stream].append(value)``,
    ``run.stop()``."""
    import sys
    import types

    from ae_waveforms_tpu.train.logs import JsonlTracker, make_tracker

    class _Stream:
        def __init__(self):
            self.values = []

        def append(self, v):
            self.values.append(v)

    class _Run:
        def __init__(self, **kwargs):
            self.kwargs = kwargs
            self.streams = {}
            self.stopped = False

        def __getitem__(self, name):
            return self.streams.setdefault(name, _Stream())

        def stop(self):
            self.stopped = True

    runs = []
    fake = types.ModuleType("neptune")
    fake.init_run = lambda **kw: runs.append(_Run(**kw)) or runs[-1]
    monkeypatch.setitem(sys.modules, "neptune", fake)
    monkeypatch.setenv("NPT_PROJECT", "ws/proj")
    monkeypatch.setenv("NPT_API_TOKEN", "tok")

    tr = make_tracker("neptune", str(tmp_path), tags=["LSTMAutoencoder", 3])
    assert tr.__class__.__name__ == "NeptuneTracker"
    run = runs[0]
    assert run.kwargs["project"] == "ws/proj"
    assert run.kwargs["api_token"] == "tok"
    assert run.kwargs["tags"] == ["LSTMAutoencoder", "3"]  # stringified like the reference's
    tr.log("Train Loss", 0.5)
    tr.log("Train Loss", 0.25)
    tr.log("Validation loss", 0.4)
    tr.close()
    assert run.streams["Train Loss"].values == [0.5, 0.25]
    assert run.streams["Validation loss"].values == [0.4]
    assert run.stopped

    # without a neptune module the factory must fall back to jsonl, not raise
    monkeypatch.setitem(sys.modules, "neptune", None)  # import -> ImportError
    assert isinstance(make_tracker("neptune", str(tmp_path)), JsonlTracker)


def test_profiling_timer_and_trace(tmp_path):
    from ae_waveforms_tpu.train.profiling import Timer, trace

    t = Timer()
    assert t.lap() >= 0.0
    with trace(None):  # no-op path
        pass
    with trace(str(tmp_path / "prof")):  # real jax.profiler trace
        jax.block_until_ready(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
    assert any((tmp_path / "prof").rglob("*"))


def test_vitaldb_gated_offline():
    from ae_waveforms_tpu.data import vitaldb_io

    assert vitaldb_io.have_vitaldb() is False  # no egress in this image
    loader = vitaldb_io.make_loader(["SNUADC/ECG_II"], synthetic_fallback=True)
    rec = loader(1)
    assert rec is not None and rec.ndim == 1 and np.isfinite(rec).any()
    with pytest.raises(RuntimeError, match="vitaldb"):
        vitaldb_io.make_loader(["SNUADC/ECG_II"], synthetic_fallback=False)


def test_lstm_stack_apply_matches_per_layer_scans():
    """lstm_stack_apply (one scan over time for the whole stack) must match
    the per-layer lstm_apply path exactly — outputs, last hidden, and the
    between-layer dropout trajectory (same keys => same masks)."""
    import jax.numpy as jnp

    from ae_waveforms_tpu.models.layers import (
        dropout,
        lstm_apply,
        lstm_init,
        lstm_stack_apply,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    layers = [
        lstm_init(ks[0], 1, 16),
        lstm_init(ks[1], 16, 8),
        lstm_init(ks[2], 8, 4),
    ]
    x = jax.random.normal(ks[3], (3, 24, 1))

    # eval path: no dropout
    hs_seq, h = x, None
    for p in layers:
        hs_seq, h = lstm_apply(p, hs_seq)
    hs_st, h_st = lstm_stack_apply(layers, x)
    np.testing.assert_allclose(np.asarray(hs_st), np.asarray(hs_seq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_st), np.asarray(h), atol=1e-6)

    # train path: between-layer dropout, identical keys on both sides
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    h1, _ = lstm_apply(layers[0], x)
    h1 = dropout(k1, h1, 0.2, True)
    h2, _ = lstm_apply(layers[1], h1)
    h2 = dropout(k2, h2, 0.2, True)
    hs_seq, h = lstm_apply(layers[2], h2)

    masks = [
        dropout(k, jnp.ones((3, 24, p["w_hh"].shape[1]), x.dtype), 0.2, True)
        for k, p in zip((k1, k2), layers[:-1])
    ]
    hs_st, h_st = lstm_stack_apply(layers, x, masks)
    np.testing.assert_allclose(np.asarray(hs_st), np.asarray(hs_seq), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_st), np.asarray(h), atol=1e-5)


def test_compilation_cache_partitioning(tmp_path, monkeypatch):
    """Relay-compiled XLA:CPU executables must never be persisted (the
    remote builder targets ITS host's CPU features — reloading them here is
    the observed 'machine type ... SIGILL' hazard in the multichip dryrun);
    local CPU compiles keep a host-fingerprinted partition."""
    from ae_waveforms_tpu.core import runtime

    relay_vars = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                  "AXON_LOOPBACK_RELAY")
    for v in relay_vars:
        monkeypatch.delenv(v, raising=False)
    local_dir = runtime.enable_compilation_cache(str(tmp_path))
    assert local_dir is not None and local_dir.startswith(str(tmp_path))
    assert "local" in os.path.basename(local_dir)
    assert runtime._host_cpu_fingerprint() in os.path.basename(local_dir)

    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    assert runtime.enable_compilation_cache(str(tmp_path)) is None
    # the local partition was not clobbered and jax still points at it
    assert jax.config.jax_compilation_cache_dir == local_dir


def test_host_cpu_fingerprint_feature_lines(tmp_path):
    """x86 'flags' and aarch64 'Features' lines both key the fingerprint;
    distinct feature sets must hash differently, and a file with neither
    line falls back to the (non-empty) platform identity."""
    from ae_waveforms_tpu.core.runtime import _host_cpu_fingerprint

    x86 = tmp_path / "x86"
    x86.write_text("processor: 0\nflags\t\t: fpu avx2 avx512f\n")
    arm = tmp_path / "arm"
    arm.write_text("processor: 0\nFeatures\t: fp asimd sve\n")
    arm2 = tmp_path / "arm2"
    arm2.write_text("processor: 0\nFeatures\t: fp asimd\n")
    bare = tmp_path / "bare"
    bare.write_text("processor: 0\n")

    fps = {p.name: _host_cpu_fingerprint(str(p)) for p in (x86, arm, arm2, bare)}
    assert all(len(f) == 8 for f in fps.values())
    assert len(set(fps.values())) == 4  # arm != arm2: ARM hosts don't collide
    assert fps["bare"] == _host_cpu_fingerprint(str(bare))  # deterministic
    assert _host_cpu_fingerprint(str(tmp_path / "missing")) == fps["bare"]
