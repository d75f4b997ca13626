"""Micro-ablation inside _tp_peak_one at the real shapes (B=256, K=72)."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()

B, K, W = 256, 72, 896
rng = np.random.default_rng(0)
d = jnp.asarray(rng.standard_normal((B, K, W)).astype(np.float32))
mask = jnp.asarray(rng.uniform(size=(B, K, W)) > 0.9)
idxv = jnp.asarray(rng.integers(0, W, (B, K, W)).astype(np.int32))
BIG = 10**9

def timeit(name, f):
    out = f(); np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f()
    np.asarray(out)
    print(f"{name:24s} {(time.perf_counter()-t0)/5*1e3:8.1f} ms", flush=True)

def next_index(m):
    idx = jnp.where(m, jnp.arange(W), BIG)
    return jax.lax.associative_scan(jnp.minimum, idx, reverse=True, axis=2)

def rev_cummin(m):
    idx = jnp.where(m, jnp.arange(W), BIG)
    return jax.lax.cummin(idx[..., ::-1], axis=2)[..., ::-1]

timeit("assoc_scan rev (x2)", lambda: jnp.sum(next_index(mask) + next_index(~mask)))
timeit("lax.cummin rev (x2)", lambda: jnp.sum(rev_cummin(mask) + rev_cummin(~mask)))
timeit("elementwise 20 ops", lambda: jnp.sum(jnp.tanh(d) + jnp.abs(d) * 1.1 + jnp.sign(d) - jnp.square(d) + jnp.exp(-jnp.abs(d)) + jnp.sqrt(jnp.abs(d))))
timeit("value gather d[idx]", lambda: jnp.sum(jnp.take_along_axis(d, idxv, axis=-1)))
timeit("reduce max+sum", lambda: jnp.sum(jnp.max(d, axis=-1) + jnp.sum(d, axis=-1)))
