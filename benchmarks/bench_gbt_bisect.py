import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from ae_waveforms_tpu.classify.gbt import fit_gbt_multi, bin_data, compute_bin_edges
import ae_waveforms_tpu.classify.gbt as gbt

S, N, F, BINS, DEPTH, TREES = 24, 12500, 10, 256, 6, 100
rng = np.random.default_rng(0)
X = rng.standard_normal((N, F)).astype(np.float32)
y = (X[:, 0] + 0.5 * X[:, 1] + 0.3 * rng.standard_normal(N) > 0).astype(np.float32)
bins = jnp.asarray(bin_data(X, compute_bin_edges(X, BINS)))
row_w = jnp.asarray((rng.uniform(size=(S, N)) > 0.33).astype(np.float32))
rngs = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))

def timeit(fn, *a, **kw):
    out = fn(*a, **kw)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return time.perf_counter() - t0

# constant (python-float) hyperparams, no per-candidate tracing
t = timeit(fit_gbt_multi, bins, jnp.asarray(y), row_w, rngs,
           max_depth=DEPTH, n_estimators=TREES, learning_rate=0.1,
           gamma=1.0, min_child_weight=3.0, subsample=0.8,
           colsample_bytree=0.8, n_bins=BINS)
print(f"multi const-hp : {t:.2f}s  {t/TREES*1000:.2f} ms/tree")

# subsample/colsample == 1.0 exactly (XLA folds the uniform draws?)
t = timeit(fit_gbt_multi, bins, jnp.asarray(y), row_w, rngs,
           max_depth=DEPTH, n_estimators=TREES, learning_rate=0.1,
           gamma=0.0, min_child_weight=1.0, subsample=1.0,
           colsample_bytree=1.0, n_bins=BINS)
print(f"multi sub=1.0  : {t:.2f}s  {t/TREES*1000:.2f} ms/tree")
