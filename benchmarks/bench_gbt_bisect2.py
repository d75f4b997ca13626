import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import jax, jax.numpy as jnp, numpy as np
from ae_waveforms_tpu.classify.gbt import _fit_gbt_margins, bin_data, compute_bin_edges

S, N, F, BINS, DEPTH, TREES = 24, 12500, 10, 256, 6, 100
rng = np.random.default_rng(0)
X = rng.standard_normal((N, F)).astype(np.float32)
y = jnp.asarray((X[:, 0] + 0.5 * X[:, 1] + 0.3 * rng.standard_normal(N) > 0).astype(np.float32))
bins = jnp.asarray(bin_data(X, compute_bin_edges(X, BINS)))
row_w = jnp.asarray((rng.uniform(size=(S, N)) > 0.33).astype(np.float32))
rngs = jax.vmap(jax.random.PRNGKey)(np.arange(S, dtype=np.uint32))

full = jnp.full
cases = {
    # name: (traced_names)
    "none": [],
    "lr": ["lr"], "gamma": ["gamma"], "mcw": ["mcw"],
    "sub": ["sub"], "col": ["col"], "n_act": ["n_act"], "dlim": ["dlim"],
    "all": ["lr", "gamma", "mcw", "sub", "col", "n_act", "dlim"],
}
const = dict(lr=0.1, gamma=1.0, mcw=3.0, sub=0.8, col=0.8, n_act=TREES, dlim=DEPTH)
batched = dict(
    lr=full(S, 0.1, jnp.float32), gamma=full(S, 1.0, jnp.float32),
    mcw=full(S, 3.0, jnp.float32), sub=full(S, 0.8, jnp.float32),
    col=full(S, 0.8, jnp.float32), n_act=full(S, TREES, jnp.int32),
    dlim=full(S, DEPTH, jnp.int32),
)

for name, traced in cases.items():
    v = {k: (batched[k] if k in traced else None) for k in const}
    def one(w, k, lrv, gv, mv, sv, cv, nv, dv):
        return _fit_gbt_margins(
            bins, y, w, k, DEPTH, TREES,
            lrv if lrv is not None else const["lr"],
            gv if gv is not None else const["gamma"],
            mv if mv is not None else const["mcw"],
            sv if sv is not None else const["sub"],
            cv if cv is not None else const["col"],
            BINS,
            nv if nv is not None else const["n_act"],
            dv if dv is not None else const["dlim"],
        )[1]
    axes = (0, 0) + tuple(0 if v[k] is not None else None for k in ["lr","gamma","mcw","sub","col","n_act","dlim"])
    fn = jax.jit(jax.vmap(one, in_axes=axes))
    args = (row_w, rngs) + tuple(v[k] for k in ["lr","gamma","mcw","sub","col","n_act","dlim"])
    out = fn(*args); np.asarray(out)
    t0 = time.perf_counter(); out = fn(*args); np.asarray(out)
    t = time.perf_counter() - t0
    print(f"traced={name:6s}: {t:.2f}s  {t/TREES*1000:.2f} ms/tree")
