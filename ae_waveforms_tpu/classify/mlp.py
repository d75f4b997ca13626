"""MLP classifier head — the second TPU-native alternative to the
reference's XGBoost latent classifiers (SURVEY §7.6: "optionally add a JAX
GBT or MLP head ... vmapped over the 25 seeds").

Small dense net (d -> 64 -> 32 -> 1) trained full-batch with Adam + BCE
under one ``lax.scan`` — a single compiled program per fit, and the whole
25-seed evaluation harness vmaps over row-weight masks exactly like
``fit_gbt_multi``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fit_mlp", "fit_mlp_multi", "predict_mlp", "MLPClassifier"]


def _init(key, d_in: int, hidden=(64, 32)):
    dims = (d_in, *hidden, 1)
    ks = jax.random.split(key, len(dims) - 1)
    params = []
    for k, (a, b) in zip(ks, zip(dims[:-1], dims[1:])):
        w = jax.random.normal(k, (a, b)) * jnp.sqrt(2.0 / a)
        params.append({"w": w.astype(jnp.float32), "b": jnp.zeros((b,), jnp.float32)})
    return params


def _forward(params, X):
    h = X
    for layer in params[:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    return (h @ params[-1]["w"] + params[-1]["b"])[:, 0]  # logits


@functools.partial(jax.jit, static_argnames=("steps", "hidden"))
def fit_mlp(
    X: jnp.ndarray,  # (n, d) shared feature pool
    y: jnp.ndarray,  # (n,)
    row_weight: jnp.ndarray,  # (n,) selection mask
    rng: jnp.ndarray,
    steps: int = 300,
    lr: float = 1e-2,
    hidden=(64, 32),
):
    n, d = X.shape
    params = _init(rng, d, hidden)
    m = jax.tree_util.tree_map(jnp.zeros_like, params)
    v = jax.tree_util.tree_map(jnp.zeros_like, params)
    w_sum = jnp.maximum(jnp.sum(row_weight), 1.0)

    def loss_fn(p):
        logits = _forward(p, X)
        bce = jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return jnp.sum(bce * row_weight) / w_sum

    def step(carry, t):
        p, m, v = carry
        g = jax.grad(loss_fn)(p)
        b1, b2, eps = 0.9, 0.999, 1e-8
        m = jax.tree_util.tree_map(lambda a, gg: b1 * a + (1 - b1) * gg, m, g)
        v = jax.tree_util.tree_map(lambda a, gg: b2 * a + (1 - b2) * gg * gg, v, g)
        t1 = t + 1.0
        p = jax.tree_util.tree_map(
            lambda pp, mm, vv: pp - lr * (mm / (1 - b1**t1)) / (jnp.sqrt(vv / (1 - b2**t1)) + eps),
            p, m, v,
        )
        return (p, m, v), None

    (params, _, _), _ = jax.lax.scan(step, (params, m, v), jnp.arange(steps, dtype=jnp.float32))
    return params


@functools.partial(jax.jit, static_argnames=("steps", "hidden"))
def fit_mlp_multi(X, y, row_weights, rngs, steps: int = 300, lr: float = 1e-2, hidden=(64, 32)):
    """All seeds in one vmapped program (shared X/y, per-seed masks/keys)."""
    return jax.vmap(lambda w, k: fit_mlp(X, y, w, k, steps=steps, lr=lr, hidden=hidden))(row_weights, rngs)


@jax.jit
def predict_mlp(params, X):
    return jax.nn.sigmoid(_forward(params, X))


class MLPClassifier:
    """sklearn-style wrapper with per-feature standardisation."""

    def __init__(self, steps: int = 300, lr: float = 1e-2, hidden=(64, 32), random_state: int = 0, **_):
        self.steps, self.lr, self.hidden = int(steps), float(lr), tuple(hidden)
        self.random_state = int(random_state)
        self._params = None
        self._mu = self._sd = None

    def fit(self, X: np.ndarray, y: np.ndarray, sample_weight: Optional[np.ndarray] = None):
        X = np.asarray(X, np.float32)
        self._mu = X.mean(axis=0)
        self._sd = X.std(axis=0) + 1e-8
        Xs = (X - self._mu) / self._sd
        w = np.ones(len(y), np.float32) if sample_weight is None else np.asarray(sample_weight, np.float32)
        self._params = fit_mlp(
            jnp.asarray(Xs), jnp.asarray(y, jnp.float32), jnp.asarray(w),
            jax.random.PRNGKey(self.random_state), steps=self.steps, lr=self.lr, hidden=self.hidden,
        )
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        Xs = (np.asarray(X, np.float32) - self._mu) / self._sd
        p1 = np.asarray(predict_mlp(self._params, jnp.asarray(Xs)))
        return np.stack([1 - p1, p1], axis=1)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba(X)[:, 1] >= 0.5).astype(int)
