import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from ae_waveforms_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()

B, T, S, C = 256, 10000, 128, 2048
rng = np.random.default_rng(0)
mask = jnp.asarray(rng.uniform(size=(B, T)) > 0.995)
x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))

def timeit(name, f):
    out = f(); np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f()
    np.asarray(out)
    print(f"{name:26s} {(time.perf_counter()-t0)/5*1e3:8.1f} ms", flush=True)

def compact(m):
    idxs = jnp.arange(T)
    rank = jnp.cumsum(m, axis=1) - 1
    out = jnp.full((m.shape[0], S), T, jnp.int32)
    tgt = jnp.where(m, rank, S)
    return jax.vmap(lambda o, t: o.at[t].set(idxs, mode="drop"))(out, tgt)

def compact_c(m):
    idxs = jnp.arange(T)
    rank = jnp.cumsum(m, axis=1) - 1
    out = jnp.full((m.shape[0], C), T, jnp.int32)
    tgt = jnp.where(m, rank, C)
    return jax.vmap(lambda o, t: o.at[t].set(idxs, mode="drop"))(out, tgt)

def topk_compact(m):
    # k smallest masked indices via top_k on negated keys
    key = jnp.where(m, -jnp.arange(T), -(T + 1))
    v = jax.lax.top_k(key, S)[0]
    return jnp.where(v > -(T + 1), -v, T)

timeit("scatter compact ->128", lambda: compact(mask))
timeit("scatter compact ->2048", lambda: compact_c(mask))
timeit("top_k compact ->128", lambda: topk_compact(mask))
timeit("boxcar-ish 2 gathers", lambda: jnp.sum(jnp.take_along_axis(x, jnp.clip(jnp.arange(T)[None, :] + 37, 0, T - 1).repeat(B, 0), axis=1)))
timeit("sparse tables 15 lvl", lambda: jnp.sum(sum(jnp.maximum(x, jnp.roll(x, -(1 << k), axis=1)) for k in range(15))))
