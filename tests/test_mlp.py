"""MLP classifier head: quality and vmapped multi-seed consistency."""

import numpy as np
import jax
import jax.numpy as jnp
from sklearn.metrics import roc_auc_score

from ae_waveforms_tpu.classify.mlp import MLPClassifier, fit_mlp, fit_mlp_multi, predict_mlp


def _task(n=1200, d=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d)).astype(np.float32)
    y = ((X[:, 0] + 0.7 * X[:, 1] - 0.4 * X[:, 2] + 0.3 * rng.standard_normal(n)) > 0).astype(np.float32)
    return X[:800], X[800:], y[:800], y[800:]


def test_mlp_auc():
    Xtr, Xte, ytr, yte = _task()
    m = MLPClassifier(steps=300, lr=1e-2, random_state=0).fit(Xtr, ytr)
    auc = roc_auc_score(yte, m.predict_proba(Xte)[:, 1])
    assert auc > 0.9


def test_multi_matches_single():
    Xtr, Xte, ytr, yte = _task(seed=1)
    Xs = jnp.asarray((Xtr - Xtr.mean(0)) / (Xtr.std(0) + 1e-8))
    yj = jnp.asarray(ytr)
    weights = np.ones((3, len(ytr)), np.float32)
    weights[1, ::3] = 0.0
    weights[2, 400:] = 0.0
    rngs = jax.vmap(jax.random.PRNGKey)(np.arange(3, dtype=np.uint32))
    multi = fit_mlp_multi(Xs, yj, jnp.asarray(weights), rngs, steps=50)
    for s in range(3):
        single = fit_mlp(Xs, yj, jnp.asarray(weights[s]), jax.random.PRNGKey(s), steps=50)
        pm = np.asarray(predict_mlp(jax.tree_util.tree_map(lambda a: a[s], multi), Xs))
        ps = np.asarray(predict_mlp(single, Xs))
        # vmapped and single fits differ only by f32 reduction order; 50 Adam
        # steps can amplify that to a few e-3 on the output probabilities
        np.testing.assert_allclose(pm, ps, atol=5e-3)
