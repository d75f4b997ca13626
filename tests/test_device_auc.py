"""Device rank-statistic ROC-AUC matches sklearn, including ties and
padded entries."""

import jax.numpy as jnp
import numpy as np
from sklearn.metrics import roc_auc_score

from ae_waveforms_tpu.classify.harness import _roc_auc_device


def test_matches_sklearn_random():
    rng = np.random.default_rng(0)
    for trial in range(5):
        m = rng.standard_normal(501).astype(np.float32)
        y = (rng.uniform(size=501) > 0.4).astype(np.float32)
        got = float(_roc_auc_device(jnp.asarray(m), jnp.asarray(y), jnp.ones(501, bool)))
        want = roc_auc_score(y, m)
        assert abs(got - want) < 1e-6, (trial, got, want)


def test_ties_and_padding():
    rng = np.random.default_rng(1)
    m = np.round(rng.standard_normal(300), 1).astype(np.float32)  # heavy ties
    y = (rng.uniform(size=300) > 0.5).astype(np.float32)
    want = roc_auc_score(y, m)
    # pad with garbage entries that must be ignored
    pad = 57
    mp = np.concatenate([m, rng.standard_normal(pad).astype(np.float32)])
    yp = np.concatenate([y, np.ones(pad, np.float32)])
    valid = np.concatenate([np.ones(300, bool), np.zeros(pad, bool)])
    got = float(_roc_auc_device(jnp.asarray(mp), jnp.asarray(yp), jnp.asarray(valid)))
    assert abs(got - want) < 1e-6
