import pathlib, sys, time
sys.path.insert(0, "/root/repo")
import functools
import numpy as np, jax, jax.numpy as jnp
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
import ae_waveforms_tpu.signals.rpeaks as R

B, T = 256, 10000
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))

def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    for l in leaves:
        np.asarray(l)

def timeit(name, f):
    out = f(); _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f()
    _sync(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)

sampling_rate = 500
levels = int(np.ceil(np.log2(T))) + 1

def upto_qrs(sig):
    xx = sig.astype(jnp.float32)
    absgrad = jnp.abs(R._gradient(xx))
    smoothgrad = R._boxcar_smooth(absgrad, 50)
    avggrad = R._boxcar_smooth(smoothgrad, 375)
    return smoothgrad > 1.5 * avggrad

def upto_compact(sig):
    qrs = upto_qrs(sig)
    Tn = sig.shape[0]
    rise = (~qrs[:-1]) & qrs[1:]
    fall = qrs[:-1] & (~qrs[1:])
    idxs = jnp.arange(Tn - 1)
    def compact(mask, fill):
        rank = jnp.cumsum(mask) - 1
        out = jnp.full((R.MAX_SEGMENTS,), fill, jnp.int32)
        out = out.at[jnp.where(mask, rank, R.MAX_SEGMENTS)].set(idxs, mode="drop")
        return out, jnp.sum(mask)
    b, nb = compact(rise, Tn)
    e, ne = compact(fall, Tn)
    return b, e

def upto_tables(sig):
    xx = sig.astype(jnp.float32)
    return R._sparse_tables(xx, levels)

def upto_nearest(sig):
    xx = sig.astype(jnp.float32)
    maxt, mint = R._sparse_tables(xx, levels)
    pos = jnp.arange(T)
    lo = jnp.zeros(T, jnp.int32); hi = jnp.full(T, T - 1, jnp.int32)
    ls = R._nearest_higher(xx, maxt, pos, xx, lo, hi, levels, left=True)
    rs = R._nearest_higher(xx, maxt, pos, xx, lo, hi, levels, left=False)
    return ls, rs

timeit("full find_rpeaks", lambda: jax.jit(jax.vmap(lambda s: R.find_rpeaks(s, 500, 128)))(x))
timeit("gradient+smooth+qrs", jax.jit(jax.vmap(upto_qrs)).__call__ if False else (lambda f=jax.jit(jax.vmap(upto_qrs)): f(x)))
timeit("..+compact scatters", (lambda f=jax.jit(jax.vmap(upto_compact)): f(x)))
timeit("sparse tables only", (lambda f=jax.jit(jax.vmap(upto_tables)): f(x)))
timeit("tables+nearest_higher", (lambda f=jax.jit(jax.vmap(upto_nearest)): f(x)))
