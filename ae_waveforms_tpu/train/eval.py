"""Test/inference pass with latent export (capability twin of
functions_ae/run_test.py:18-129).

Loads the best (or final) checkpoint, runs the test split in one jitted
batched pass, writes ``np_waves_test_pred.npy`` and ``np_latent_spaces.npy``
with the reference's layout-dependent squeeze (conv latents (B, d, 1) ->
(B, d); predictions squeezed to (B, 320)), prints the global loss,
per-sample RMSE and PRD, and optionally saves the RMSE violin plot.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.core.schema import ArraySet, load_arrays
from ae_waveforms_tpu.models.registry import MODEL_REGISTRY
from ae_waveforms_tpu.parallel.mesh import data_mesh
from ae_waveforms_tpu.train import checkpoint as ckpt
from ae_waveforms_tpu.train.data import layout_waves
from ae_waveforms_tpu.train.loop import _batched_indices, _elementwise_loss, _finalize_loss
from ae_waveforms_tpu.train.losses import sample_prd_loss, sample_rmse_loss

__all__ = ["main_test", "load_trained_params"]


def load_trained_params(model_dir: str, cfg: TrainConfig) -> Dict:
    """Rebuild the architecture and load weights, preferring the rolling
    best checkpoint (load_model.py:35-84 semantics)."""
    mdef = MODEL_REGISTRY[cfg.model_class]
    template = mdef.init(jax.random.PRNGKey(0), cfg.latent_size, cfg.dropout)
    path = ckpt.latest_best(model_dir)
    return ckpt.load_state(path, template)


def main_test(
    cfg: TrainConfig,
    arrays: Optional[ArraySet] = None,
    params: Optional[Dict] = None,
    mesh=None,
) -> Tuple[str, tuple, tuple, np.ndarray]:
    if cfg.model_class not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model class {cfg.model_class!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    mdef = MODEL_REGISTRY[cfg.model_class]
    if mesh is None:
        mesh = data_mesh()

    results_dir = os.path.join(cfg.results_dir, "test_autoencoder", cfg.trained_model)
    os.makedirs(results_dir, exist_ok=True)
    results_file = os.path.join(results_dir, "np_waves_test_pred.npy")

    model_dir = os.path.join(cfg.results_dir, "networks_autoencoder", cfg.trained_model)
    if params is None:
        params = load_trained_params(model_dir, cfg)

    if arrays is None:
        arrays = load_arrays(cfg.dataset_dir)
    test_files = sorted(glob.glob(os.path.join(model_dir, "indices_test_*.npy")))
    if not test_files:
        raise FileNotFoundError(f"no test-index mask in {model_dir}")
    te_mask = np.load(test_files[0])
    if int(te_mask.sum()) == 0:
        raise ValueError(
            f"test-index mask in {model_dir} selects 0 samples: the seeded "
            "patient-level draw left the test split empty — re-split with a "
            "different seed, more cases, or a larger split_size_test"
        )

    x_np = layout_waves(np.asarray(arrays.waves, np.float32)[te_mask], mdef.channel_first)
    n = len(x_np)
    x_dev = jax.device_put(x_np, NamedSharding(mesh, P()))
    idx, mask = _batched_indices(n, cfg.batch_size, np.arange(n, dtype=np.int32))

    @jax.jit
    def run(params, x_all, idx):
        def body(_, bidx):
            x = jnp.take(x_all, bidx, axis=0)
            x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data", None, None)))
            pred = mdef.forward(params, x, train=False)
            z = mdef.encode(params, x)
            return None, (pred, z)

        _, (preds, zs) = jax.lax.scan(body, None, idx)
        return preds, zs

    preds, zs = run(params, x_dev, jnp.asarray(idx))
    preds = np.asarray(preds).reshape(-1, *preds.shape[2:])[: n]
    zs = np.asarray(zs).reshape(-1, *zs.shape[2:])[: n]

    # layout-dependent squeeze (run_test.py:104-109)
    pred_flat = preds.reshape(n, -1)
    if zs.ndim == 3:
        zs = zs.reshape(n, -1)
    np.save(results_file, pred_flat)
    np.save(os.path.join(results_dir, "np_latent_spaces.npy"), zs)

    true_flat = x_np.reshape(n, -1)
    elem = _elementwise_loss(cfg.loss, pred_flat, true_flat)
    test_loss = float(_finalize_loss(cfg.loss, elem.sum(), elem.size))
    rmse_avg, rmse_per = sample_rmse_loss(jnp.asarray(pred_flat), jnp.asarray(true_flat))
    prd_avg, prd_per = sample_prd_loss(jnp.asarray(pred_flat), jnp.asarray(true_flat))
    rmse_avg, prd_avg = float(rmse_avg), float(prd_avg)
    rmse_per, prd_per = np.asarray(rmse_per), np.asarray(prd_per)

    print(f"Global test {cfg.loss.upper()} loss: {test_loss:.6f}")
    print(f"Sample wise average test RMSE loss: {rmse_avg:.6f}")
    print(f"Sample wise average test PRD loss: {prd_avg:.6f}")

    if cfg.plotting:
        from ae_waveforms_tpu.analysis.plots import plot_rmse_distribution

        plot_rmse_distribution(rmse_avg, rmse_per, results_dir)

    return (
        results_file,
        (test_loss, rmse_avg, rmse_per, prd_avg, prd_per),
        (pred_flat, true_flat, np.asarray(arrays.info)[te_mask]),
        zs,
    )
