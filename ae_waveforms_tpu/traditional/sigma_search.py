"""Sigma-map optimisation for the Gaussian reconstruction.

The reference runs ``skopt.gp_minimize`` over 12 integer dims in [1, 5] for
2000 calls, each call reconstructing the full test set in a Python loop
(analysis_performance_traditional_vs_ae.py:55-99).  Here the objective is a
single batched device call (candidates x samples vmapped), and two search
strategies are provided:

- :func:`gp_minimize` — a from-scratch Gaussian-process (Matern 5/2 + EI)
  Bayesian optimiser with the same call budget/seed/x0 interface, for
  procedure parity;
- :func:`sweep_search` — TPU-native: score thousands of lattice candidates
  per second in device-batched sweeps; on this 5^12 lattice it reaches the
  same optimum orders of magnitude faster and is the recommended mode.

Quality parity target (BASELINE.md): the final metrics are computed with the
published sigma_map [1,2,2,3,2,3,3,2,3,2,2,1] regardless of search path,
exactly like the reference's hard-coded final map (analysis_...:121).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ae_waveforms_tpu.traditional.reconstruction import reconstruct_gaussian_sweep

__all__ = [
    "FIDUCIAL_X_ORDER",
    "FIDUCIAL_Y_ORDER",
    "BASELINE_Y_COLS",
    "DEFAULT_SIGMA_MAP",
    "SIGMA_MAP_X0",
    "prepare_reconstruction_inputs",
    "make_objective",
    "sweep_search",
    "gp_minimize",
    "skopt_gp_minimize",
]

# occurrence-order reindex of the 20 fiducial feature columns
# (analysis_...:40-41): P on/peak/off, Q, R on, [R], R off, S, T on/peak/off
FIDUCIAL_X_ORDER = [2, 0, 4, 8, 6, 12, 10, 16, 14, 18]
FIDUCIAL_Y_ORDER = [3, 1, 5, 9, 7, 13, 11, 17, 15, 19]
BASELINE_Y_COLS = [3, 5, 9, 11, 17, 19]  # onset/offset y's averaged into the baseline
DEFAULT_SIGMA_MAP = np.array([1, 2, 2, 3, 2, 3, 3, 2, 3, 2, 2, 1], float)
SIGMA_MAP_X0 = np.array([1, 1, 1, 2, 2, 3, 3, 3, 4, 2, 2, 1], float)


def prepare_reconstruction_inputs(features: np.ndarray, sampling_frequency: int = 500):
    """(B, 35) feature rows -> (features_x (B, 11), features_y (B, 11),
    baselines (B,), x_time (320,)), replicating analysis_...:33-48: R is
    inserted at slot 5 as (0, -1e-10); baseline is the nanmean of the six
    onset/offset y columns."""
    fx = features[:, FIDUCIAL_X_ORDER]
    fy = features[:, FIDUCIAL_Y_ORDER]
    fx = np.insert(fx, 5, 0.0, axis=1)
    fy = np.insert(fy, 5, -1e-10, axis=1)
    with np.errstate(all="ignore"):
        baselines = np.nanmean(features[:, BASELINE_Y_COLS], axis=1)
    x_time = np.linspace(-106, 214 - 1, 320) / sampling_frequency * 1000
    return fx, fy, baselines, x_time


def make_objective(
    features_x: np.ndarray,
    features_y: np.ndarray,
    baselines: np.ndarray,
    x_time: np.ndarray,
    test_true: np.ndarray,
    chunk: int = 32,
) -> Callable[[np.ndarray], np.ndarray]:
    """Batched MSE objective: (S, 12) sigma maps -> (S,) mean-squared error
    against ``test_true`` (the max-subtracted median beats)."""
    fx = jnp.asarray(features_x, jnp.float32)
    fy = jnp.asarray(features_y, jnp.float32)
    bs = jnp.asarray(baselines, jnp.float32)
    xt = jnp.asarray(x_time, jnp.float32)
    tt = jnp.asarray(test_true, jnp.float32)

    def objective(sigma_maps: np.ndarray) -> np.ndarray:
        sigma_maps = np.atleast_2d(np.asarray(sigma_maps, np.float32))
        out = []
        for i in range(0, len(sigma_maps), chunk):
            recon = reconstruct_gaussian_sweep(fx, fy, xt, bs, jnp.asarray(sigma_maps[i : i + chunk]))
            out.append(np.asarray(jnp.mean((recon - tt[None]) ** 2, axis=(1, 2))))
        return np.concatenate(out)

    return objective


def sweep_search(
    objective: Callable,
    n_candidates: int = 4096,
    seed: int = 42,
    x0: Optional[np.ndarray] = None,
    include_neighborhood: bool = True,
) -> Tuple[np.ndarray, float]:
    """Device-batched lattice search over {1..5}^12: random candidates, the
    x0 seed, and (optionally) a coordinate-descent refinement pass around the
    best candidate."""
    rng = np.random.default_rng(seed)
    cands = rng.integers(1, 6, size=(n_candidates, 12)).astype(np.float32)
    if x0 is not None:
        cands = np.vstack([np.asarray(x0, np.float32), cands])
    scores = objective(cands)
    best = int(np.argmin(scores))
    best_map, best_score = cands[best].copy(), float(scores[best])

    if include_neighborhood:
        for _ in range(3):  # coordinate-descent sweeps: 12 dims x 5 values
            neigh = []
            for d in range(12):
                for v in range(1, 6):
                    c = best_map.copy()
                    c[d] = v
                    neigh.append(c)
            neigh = np.asarray(neigh, np.float32)
            s = objective(neigh)
            i = int(np.argmin(s))
            if s[i] < best_score - 1e-12:
                best_map, best_score = neigh[i].copy(), float(s[i])
            else:
                break
    return best_map.astype(int), best_score


# ----------------------- Gaussian-process optimiser --------------------------


def _matern52(X1, X2, length):
    d = np.sqrt(np.maximum(((X1[:, None, :] - X2[None, :, :]) ** 2).sum(-1), 0.0)) / length
    s5 = np.sqrt(5.0) * d
    return (1.0 + s5 + 5.0 / 3.0 * d * d) * np.exp(-s5)


@dataclass
class GPResult:
    x: List[int]
    fun: float
    x_iters: List[List[int]]
    func_vals: np.ndarray


def gp_minimize(
    objective: Callable,
    n_calls: int = 200,
    seed: int = 42,
    x0: Optional[np.ndarray] = None,
    n_initial: int = 20,
    batch_per_iter: int = 8,
    bounds: Tuple[int, int] = (1, 5),
    dims: int = 12,
) -> GPResult:
    """From-scratch Bayesian optimisation with a Matern-5/2 GP and expected
    improvement, evaluating ``batch_per_iter`` acquisition maximisers per
    device call (the objective is batched, so the extra evaluations are
    nearly free compared to skopt's one-at-a-time loop)."""
    rng = np.random.default_rng(seed)
    lo, hi = bounds

    X: List[np.ndarray] = []
    if x0 is not None:
        X.append(np.asarray(x0, float))
    while len(X) < n_initial:
        X.append(rng.integers(lo, hi + 1, size=dims).astype(float))
    X = list(np.unique(np.asarray(X), axis=0))
    y = list(objective(np.asarray(X)))

    while len(X) < n_calls:
        Xa = np.asarray(X)
        ya = np.asarray(y)
        mu_y, sd_y = ya.mean(), ya.std() + 1e-12
        yn = (ya - mu_y) / sd_y
        length = np.sqrt(dims) * (hi - lo) / 4.0
        K = _matern52(Xa, Xa, length) + 1e-6 * np.eye(len(Xa))
        L = np.linalg.cholesky(K)
        alpha = np.linalg.solve(L.T, np.linalg.solve(L, yn))

        # acquisition: EI over a random candidate pool + local perturbations
        pool = rng.integers(lo, hi + 1, size=(2048, dims)).astype(float)
        best_idx = np.argsort(ya)[:8]
        for b in best_idx:
            pert = Xa[b][None, :] + rng.integers(-1, 2, size=(128, dims))
            pool = np.vstack([pool, np.clip(pert, lo, hi)])
        pool = np.unique(pool, axis=0)

        Ks = _matern52(pool, Xa, length)
        mu = Ks @ alpha
        v = np.linalg.solve(L, Ks.T)
        var = np.maximum(1.0 - np.sum(v * v, axis=0), 1e-12)
        sd = np.sqrt(var)
        f_best = yn.min()
        z = (f_best - mu) / sd
        from scipy.stats import norm

        ei = sd * (z * norm.cdf(z) + norm.pdf(z))
        take = np.argsort(-ei)[: min(batch_per_iter, n_calls - len(X))]
        new_X = pool[take]
        new_y = objective(new_X)
        X.extend(list(new_X))
        y.extend(list(new_y))

    ya = np.asarray(y)
    i = int(np.argmin(ya))
    return GPResult(
        x=[int(v) for v in X[i]], fun=float(ya[i]), x_iters=[[int(v) for v in r] for r in X], func_vals=ya
    )


def skopt_gp_minimize(
    objective: Callable,
    n_calls: int = 2000,
    seed: int = 42,
    x0: Optional[np.ndarray] = None,
    dims: int = 12,
    bounds: Tuple[int, int] = (1, 5),
) -> GPResult:
    """TRAJECTORY-parity mode: the real ``skopt.gp_minimize`` configured
    exactly as the reference runs it — ``dims`` x ``Integer(1, 5)`` search
    space, ``n_calls=2000``, ``random_state=42``, ``x0`` seed point, library
    defaults for everything else
    (analysis_performance_traditional_vs_ae.py:93-99) — driving the batched
    device objective one point at a time, exactly like the reference's
    per-call Python loop.

    Gated: no skopt wheel exists in this image, so this raises ImportError
    here; ``tests/test_skopt_oracle.py`` activates wherever ``import skopt``
    succeeds, and the from-scratch :func:`gp_minimize` above remains the
    capability-equivalent fallback (same budget/seed/x0 interface).  The
    published final sigma map is hard-coded upstream regardless of the
    search path (analysis_...:121), so quality metrics do not depend on
    which optimiser produced it.
    """
    from skopt import gp_minimize as _skopt_gp  # gated optional dependency
    from skopt.space import Integer

    lo, hi = bounds
    space = [Integer(lo, hi) for _ in range(dims)]
    x0_list = [int(v) for v in (SIGMA_MAP_X0 if x0 is None else np.asarray(x0))]
    res = _skopt_gp(
        lambda params: float(objective(np.asarray(params, float)[None, :])[0]),
        dimensions=space,
        n_calls=n_calls,
        random_state=seed,
        x0=x0_list,
    )
    return GPResult(
        x=[int(v) for v in res.x],
        fun=float(res.fun),
        x_iters=[[int(v) for v in r] for r in res.x_iters],
        func_vals=np.asarray(res.func_vals, float),
    )
