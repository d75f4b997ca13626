"""Batched scoring service — the deployment-facing path.

One jitted program takes raw median beats and produces AE reconstructions,
latents, per-sample quality metrics (RMSE/PRD) and, when a classifier head
is attached, disorder probabilities.  Everything stays on device between
stages; the host only moves the input batch in and the scores out.

    scorer = Scorer.from_run(results_dir, run_name, cfg)       # AE only
    scorer.attach_gbt(gbt_classifier)                          # + head
    out = scorer.score(waves)                                  # (B, 320)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.models.registry import MODEL_REGISTRY
from ae_waveforms_tpu.train.data import layout_waves

__all__ = ["Scorer"]


@partial(jax.jit, static_argnames=("model_class",))
def _score_batch(params, x, model_class: str):
    mdef = MODEL_REGISTRY[model_class]
    pred = mdef.forward(params, x, train=False)
    z = mdef.encode(params, x)
    if z.ndim == 3:
        z = z[:, :, 0]
    flat_p = pred.reshape(pred.shape[0], -1)
    flat_x = x.reshape(x.shape[0], -1)
    rmse = jnp.sqrt(jnp.mean((flat_p - flat_x) ** 2, axis=1))
    prd = 100.0 * jnp.sqrt(jnp.sum((flat_x - flat_p) ** 2, axis=1) / jnp.sum(flat_x**2, axis=1))
    return flat_p, z, rmse, prd


@dataclass
class Scorer:
    params: Dict
    model_class: str
    gbt: Optional[object] = None

    def __post_init__(self):
        # serving latency work: params live on device from construction —
        # otherwise every request re-uploads the host copy — and compiled
        # programs persist across processes like every CLI entry point
        from ae_waveforms_tpu.core.runtime import enable_compilation_cache

        enable_compilation_cache()
        self.params = jax.device_put(self.params)

    @classmethod
    def from_run(cls, results_dir: str, run_name: str, cfg: TrainConfig) -> "Scorer":
        import os

        from ae_waveforms_tpu.train.eval import load_trained_params

        model_dir = os.path.join(results_dir, "networks_autoencoder", run_name)
        params = load_trained_params(model_dir, cfg)
        return cls(params=params, model_class=cfg.model_class)

    def attach_gbt(self, classifier) -> "Scorer":
        self.gbt = classifier
        return self

    def warmup(self, bucket: int = 64) -> float:
        """Compile (or load from the persistent cache) the scoring program
        for one bucket size before the first request; returns the wall
        seconds spent — the cold-start cost a deployment pays once."""
        import time

        t0 = time.perf_counter()
        self.score(np.zeros((1, 320), np.float32), bucket=bucket)
        return time.perf_counter() - t0

    def score(self, waves: np.ndarray, bucket: int = 64) -> Dict[str, np.ndarray]:
        """waves: (B, 320) raw median beats -> dict with reconstruction,
        latents, rmse, prd and (if attached) probability.

        Batches are padded to ``bucket`` multiples so serving compiles once
        per bucket instead of once per request size."""
        channel_first = MODEL_REGISTRY[self.model_class].channel_first
        waves = np.asarray(waves, np.float32)
        n = len(waves)
        target = max(bucket, ((n + bucket - 1) // bucket) * bucket)
        if target != n:
            waves = np.concatenate([waves, np.zeros((target - n, waves.shape[1]), np.float32)])
        x = jnp.asarray(layout_waves(waves, channel_first))
        pred, z, rmse, prd = _score_batch(self.params, x, self.model_class)
        pred, z, rmse, prd = pred[:n], z[:n], rmse[:n], prd[:n]
        out = {
            "reconstruction": np.asarray(pred),
            "latents": np.asarray(z),
            "rmse": np.asarray(rmse),
            "prd": np.asarray(prd),
        }
        if self.gbt is not None:
            out["probability"] = self.gbt.predict_proba(out["latents"])[:, 1]
        return out
