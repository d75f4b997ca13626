import time
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from ae_waveforms_tpu.classify.gbt import fit_gbt_sweep_margins, bin_data, compute_bin_edges

S, N, F, BINS, DEPTH, TREES = 24, 12500, 10, 256, 6, 500
rng = np.random.default_rng(0)
X = rng.standard_normal((N, F)).astype(np.float32)
y = (X[:, 0] + 0.5 * X[:, 1] + 0.3 * rng.standard_normal(N) > 0).astype(np.float32)
bins = jnp.asarray(bin_data(X, compute_bin_edges(X, BINS)))
row_w = jnp.asarray((rng.uniform(size=(S, N)) > 0.33).astype(np.float32))
rngs = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))
args = (bins, jnp.asarray(y), row_w, rngs,
        jnp.full(S, 0.1, jnp.float32), jnp.full(S, 1.0, jnp.float32),
        jnp.full(S, 3.0, jnp.float32), jnp.full(S, 0.8, jnp.float32),
        jnp.full(S, 0.8, jnp.float32), jnp.full(S, TREES, jnp.int32))
t0 = time.perf_counter()
ens, margins = fit_gbt_sweep_margins(*args, max_depth=DEPTH, n_estimators=TREES, n_bins=BINS)
np.asarray(margins)
t_cold = time.perf_counter() - t0
t0 = time.perf_counter()
ens, margins = fit_gbt_sweep_margins(*args, max_depth=DEPTH, n_estimators=TREES, n_bins=BINS)
m = np.asarray(margins)
t_warm = time.perf_counter() - t0
print(f"cold {t_cold:.1f}s warm {t_warm:.2f}s -> {t_warm/TREES*1000:.2f} ms/tree per {S}-fit chunk")
print(f"per candidate (3 folds = 3 fits, chunked {S}): {t_warm * 3 / S:.2f} s")
# sanity: fits actually learn
from sklearn.metrics import roc_auc_score
auc = roc_auc_score(y, m[0])
print("pool AUC (seed 0):", round(auc, 4))
