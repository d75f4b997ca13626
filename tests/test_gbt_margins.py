"""The boosting carry's final margins equal a full predict re-traversal on
the same pool — the identity the grid search's CV scoring relies on."""

import jax
import jax.numpy as jnp
import numpy as np

from ae_waveforms_tpu.classify.gbt import (
    bin_data,
    compute_bin_edges,
    fit_gbt_sweep_margins,
    predict_margin_multi,
)


def test_carry_margins_equal_predict():
    rng = np.random.default_rng(0)
    n, d, S = 600, 6, 4
    X = rng.standard_normal((n, d)).astype(np.float32)
    y = (X[:, 0] + 0.5 * rng.standard_normal(n) > 0).astype(np.float32)
    bins = jnp.asarray(bin_data(X, compute_bin_edges(X)))
    row_w = (rng.uniform(size=(S, n)) > 0.3).astype(np.float32)  # held-out rows
    rngs = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))
    ens, margins = fit_gbt_sweep_margins(
        bins, jnp.asarray(y), jnp.asarray(row_w), rngs,
        jnp.full(S, 0.2, jnp.float32), jnp.full(S, 0.1, jnp.float32),
        jnp.ones(S, jnp.float32), jnp.full(S, 0.8, jnp.float32),
        jnp.full(S, 0.9, jnp.float32), jnp.asarray([10, 20, 30, 40], jnp.int32),
        max_depth=4, n_estimators=40,
        depth_limits=jnp.asarray([2, 3, 4, 4], jnp.int32),
    )
    want = predict_margin_multi(ens, bins, 4)
    np.testing.assert_allclose(np.asarray(margins), np.asarray(want), rtol=1e-5, atol=1e-6)
