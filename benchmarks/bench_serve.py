"""Serving-path benchmark: the numbers behind serve.Scorer's
"deployment-facing path" claim (serve.py:1-11).

Measures, per model family (the flagship LSTM-AE and the conv AE,
model_classes.py:8-45 / :51-108 twins) and per bucket size 64/256/1024:

  * cold-start wall: first score() call — compile (or persistent-cache
    load) + first dispatch, what a fresh serving process pays once
  * warm request latency: p50 / p99 over N repeated full-path requests
    (host batch in -> jitted forward+encode+metrics -> host scores out),
    request size == bucket so each request is one full bucket
  * throughput: samples/s at that bucket size
  * + GBT head: the same request with an attached 100-tree classifier head
    scoring the latents (main_ae_classify.py's deployed shape)

Reference analogue: the no-grad eval loop run_test.py:77-96 — the
reference has no serving story at all; this path is new capability.

Usage:  python benchmarks/bench_serve.py  (writes one JSON line per row)
"""

from __future__ import annotations

import json
import time

import numpy as np

from ae_waveforms_tpu.core.runtime import enable_compilation_cache

BUCKETS = (64, 256, 1024)
N_WARM = 100
LATENT = 10


def bench_family(model_class: str, init_fn) -> list:
    import jax

    from ae_waveforms_tpu.classify.gbt import GBTClassifier
    from ae_waveforms_tpu.serve import Scorer

    rows = []
    rng = np.random.default_rng(0)
    params = init_fn(jax.random.PRNGKey(0), LATENT)
    scorer = Scorer(params=params, model_class=model_class)

    for bucket in BUCKETS:
        waves = rng.standard_normal((bucket, 320)).astype(np.float32)
        cold_s = None
        t0 = time.perf_counter()
        scorer.score(waves, bucket=bucket)
        cold_s = time.perf_counter() - t0

        lat = []
        for _ in range(N_WARM):
            t0 = time.perf_counter()
            scorer.score(waves, bucket=bucket)
            lat.append(time.perf_counter() - t0)
        lat = np.sort(np.asarray(lat))
        p50, p99 = float(np.percentile(lat, 50)), float(np.percentile(lat, 99))
        rows.append({
            "model": model_class, "bucket": bucket, "head": "none",
            "cold_s": round(cold_s, 3),
            "p50_ms": round(1e3 * p50, 3), "p99_ms": round(1e3 * p99, 3),
            "samples_per_s": round(bucket / p50, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    # + GBT head: train a 100-tree head on latents once, then measure the
    # full scored-with-probability request at each bucket
    z = scorer.score(rng.standard_normal((512, 320)).astype(np.float32),
                     bucket=512)["latents"]
    y = (z[:, 0] > np.median(z[:, 0])).astype(np.float32)
    gbt = GBTClassifier(max_depth=6, n_estimators=100, random_state=0).fit(z, y)
    scorer.attach_gbt(gbt)
    for bucket in BUCKETS:
        waves = rng.standard_normal((bucket, 320)).astype(np.float32)
        scorer.score(waves, bucket=bucket)  # head-path warmup
        lat = []
        for _ in range(N_WARM):
            t0 = time.perf_counter()
            scorer.score(waves, bucket=bucket)
            lat.append(time.perf_counter() - t0)
        lat = np.sort(np.asarray(lat))
        p50, p99 = float(np.percentile(lat, 50)), float(np.percentile(lat, 99))
        rows.append({
            "model": model_class, "bucket": bucket, "head": "gbt100",
            "p50_ms": round(1e3 * p50, 3), "p99_ms": round(1e3 * p99, 3),
            "samples_per_s": round(bucket / p50, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    enable_compilation_cache()
    from ae_waveforms_tpu.models import conv_ae, lstm_ae

    rows = []
    rows += bench_family("LSTMAutoencoder", lstm_ae.init)
    rows += bench_family("LeNet5AutoencoderAvgPool", conv_ae.init)
    print(json.dumps({"bench": "serve", "rows": len(rows)}))


if __name__ == "__main__":
    main()
