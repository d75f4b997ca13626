"""End-to-end deep classifier harness (capability twin of
main_dl_classify.py).

Raw median beats (first 12000 per class), fixed 250+250 test tail, and for
each training size x 25 seeds: an 80/20 stratified split, the LSTM
classifier trained with Adam(1e-4), MultiStep LR decay (x0.5 at epochs 50
and 100), BCE loss, batch 512, up to 153 epochs with AUC-based early
stopping (patience 50, min_delta 5e-4); the best-AUC weights are restored
and scored on the fixed test set.

TPU-first: one jitted program per *epoch* (lax.scan over batches) with the
BatchNorm state threaded through; the val forward pass is a second jitted
program; only the AUC computation runs on host.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache, partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.metrics import roc_auc_score
from sklearn.model_selection import train_test_split

from ae_waveforms_tpu.models import lstm_classifier

__all__ = ["train_classifier", "dl_size_seed_sweep", "DL_SIZES"]

DL_SIZES = [100, 250, 500, 750, 1000, 2000, 3000, 4000, 6000, 10000, 11500]
NUM_EPOCHS = 153

# Per-device seed-axis cap for the vmapped trainer on a real TPU, measured
# on the v5e bench shape (n=3200, batch 512, T=320, remat_chunk=20):
#   - 18 seeds execute, 22 (and 25) CRASH the TPU worker ("kernel fault"),
#     and a crashed relay worker is unrecoverable in-process — every later
#     dispatch fails UNAVAILABLE (tested: 3 retries over 30 s all fail).
#     Recovery-by-retry is therefore impossible; the split must happen
#     BEFORE dispatch.
#   - warm throughput peaks well below the cliff anyway: 5.5 (S=6),
#     6.6 (S=8), 6.0 (S=12) model-epochs/s, sharply worse at 16+ — the
#     wide programs thrash HBM before they kill the worker.
# 8 is both the measured optimum and a 2x-plus margin under the cliff.
# Since round 5 this constant is the CALIBRATION ANCHOR, not the live cap:
# ``train_classifier_multi`` computes its cap from the call's own shapes via
# the analytic HBM model (core/hbm.py), which reproduces 8 at this bench
# shape by construction; tests/test_dl_multi.py keeps model and bisection
# pinned to each other.
DL_TPU_SEED_CHUNK = 8


def _multistep_lr(epoch: int, base: float = 1e-4) -> float:
    return base * (0.5 ** ((epoch >= 50) + (epoch >= 100)))


def _epoch_core(params, state, opt_m, opt_v, opt_t, rng, x, y, idx, mask, lr,
                remat_chunk=None):
    """One epoch: scan over batches with plain Adam (torch defaults).

    ``remat_chunk`` (static): chunked rematerialisation of the LSTM scans —
    identical gradients, ~T/chunk less HBM for backward residuals, which is
    what fits all 25 sweep seeds in one program (layers.lstm_apply_remat)."""

    def step(carry, inp):
        params, state, m, v, t, rng = carry
        bidx, bmask = inp
        rng, k = jax.random.split(rng)
        bx = jnp.take(x, bidx, axis=0)
        by = jnp.take(y, bidx, axis=0)
        w = bmask.astype(jnp.float32)

        def loss_fn(p):
            probs, new_state = lstm_classifier.forward(
                p, state, bx, train=True, rng=k, remat_chunk=remat_chunk
            )
            probs = jnp.clip(probs[:, 0], 1e-7, 1 - 1e-7)
            bce = -(by * jnp.log(probs) + (1 - by) * jnp.log(1 - probs))
            return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w), 1.0), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        t = t + 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        m = jax.tree_util.tree_map(lambda mm, g: b1 * mm + (1 - b1) * g, m, grads)
        v = jax.tree_util.tree_map(lambda vv, g: b2 * vv + (1 - b2) * g * g, v, grads)
        bc1 = 1 - b1**t
        bc2 = 1 - b2**t
        params = jax.tree_util.tree_map(
            lambda p, mm, vv: p - lr * (mm / bc1) / (jnp.sqrt(vv / bc2) + eps), params, m, v
        )
        return (params, new_state, m, v, t, rng), loss

    (params, state, opt_m, opt_v, opt_t, rng), losses = jax.lax.scan(
        step, (params, state, opt_m, opt_v, opt_t, rng), (idx, mask)
    )
    return params, state, opt_m, opt_v, opt_t, rng, losses


_train_epoch = partial(jax.jit, donate_argnums=(0, 1, 2, 3))(_epoch_core)
# vmapped twin: every argument carries a leading seed axis except the shared lr
_train_epoch_multi = partial(jax.jit, donate_argnums=(0, 1, 2, 3))(
    jax.vmap(_epoch_core, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None))
)


def _epoch_block_core(params, state, opt_m, opt_v, opt_t, rng,
                      best_p, best_s, best_auc, no_improve, ever_improved,
                      x, y, idx, mask, lrs, xv, yv, patience, min_delta,
                      remat_chunk=None):
    """A whole BLOCK of epochs for one seed in one traced program: each
    epoch trains (scan over batches), runs the eval-mode validation forward,
    scores tie-corrected ROC-AUC on device, and updates the early-stopping
    carry (best-AUC parameter/state snapshot, no-improve counter) — so the
    host syncs once per block instead of twice per epoch.

    Through a tunnelled accelerator each dispatch costs a relay round trip;
    the reference's most training-heavy script (main_dl_classify.py: 275
    models x <=153 epochs) is round-trip-bound in the per-epoch form.  A
    seed past ``patience`` keeps training harmlessly (its ``improved`` gate
    is off, exactly like the host loop's ``continue``); the host stops
    dispatching blocks once every seed's counter passes patience.
    """
    from ae_waveforms_tpu.classify.harness import _roc_auc_device

    vmask = jnp.ones(yv.shape, bool)

    def epoch(carry, inp):
        (params, state, m, v, t, rng,
         best_p, best_s, best_auc, no_improve, ever) = carry
        e_idx, e_mask, lr = inp
        params, state, m, v, t, rng, _ = _epoch_core(
            params, state, m, v, t, rng, x, y, e_idx, e_mask, lr,
            remat_chunk=remat_chunk,
        )
        probs, _ = lstm_classifier.forward(params, state, xv, train=False)
        auc = _roc_auc_device(probs[:, 0], yv, vmask)
        improved = (auc - best_auc > min_delta) & (no_improve < patience)
        best_p = jax.tree_util.tree_map(lambda b, n: jnp.where(improved, n, b), best_p, params)
        best_s = jax.tree_util.tree_map(lambda b, n: jnp.where(improved, n, b), best_s, state)
        best_auc = jnp.where(improved, auc, best_auc)
        ever = ever | improved  # exact "has a snapshot" flag (any min_delta)
        no_improve = jnp.where(
            no_improve >= patience, no_improve, jnp.where(improved, 0, no_improve + 1)
        )
        return (params, state, m, v, t, rng,
                best_p, best_s, best_auc, no_improve, ever), auc

    carry = (params, state, opt_m, opt_v, opt_t, rng,
             best_p, best_s, best_auc, no_improve, ever_improved)
    carry, aucs = jax.lax.scan(epoch, carry, (idx, mask, lrs))
    return carry + (aucs,)


# every argument carries a leading seed axis except the shared per-epoch lrs
# and the early-stop thresholds; donate the full training/ES carry
@lru_cache(maxsize=None)
def _get_epoch_block_multi(remat_chunk=None):
    return partial(jax.jit, donate_argnums=tuple(range(11)))(
        jax.vmap(
            partial(_epoch_block_core, remat_chunk=remat_chunk),
            in_axes=(0,) * 11 + (0, 0, 0, 0, None, 0, 0, None, None),
        )
    )


_epoch_block_multi = _get_epoch_block_multi(None)


@jax.jit
def _predict(params, state, x):
    probs, _ = lstm_classifier.forward(params, state, x, train=False)
    return probs[:, 0]


@jax.jit
def _never_improved_fallback(best_p, best_s, params, state, ever_improved):
    """Per-seed: substitute the FINAL trained (params, state) where the
    early-stop gate never took a snapshot (explicit flag — exact for any
    min_delta sign, unlike a best_auc sentinel)."""
    S = ever_improved.shape[0]
    never = ~ever_improved
    pick = lambda b, f: jnp.where(  # noqa: E731
        never.reshape((S,) + (1,) * (f.ndim - 1)), f, b
    )
    return (
        jax.tree_util.tree_map(pick, best_p, params),
        jax.tree_util.tree_map(pick, best_s, state),
    )


def train_classifier(
    X_train: np.ndarray,
    y_train: np.ndarray,
    X_val: np.ndarray,
    y_val: np.ndarray,
    seed: int,
    num_epochs: int = NUM_EPOCHS,
    batch_size: int = 512,
    patience: int = 50,
    min_delta: float = 5e-4,
) -> Tuple[Dict, Dict]:
    """Returns the best (params, state) by validation AUC."""
    rng = jax.random.PRNGKey(seed)
    rng, k_init = jax.random.split(rng)
    params, state = lstm_classifier.init(k_init)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt_m, opt_v, opt_t = zeros, jax.tree_util.tree_map(jnp.zeros_like, params), jnp.zeros((), jnp.float32)

    x = jnp.asarray(X_train, jnp.float32)
    y = jnp.asarray(y_train, jnp.float32)
    xv = jnp.asarray(X_val, jnp.float32)
    n = len(y_train)
    steps = math.ceil(n / batch_size)
    np_rng = np.random.default_rng(seed)

    best_auc, best = 0.0, None
    no_improve = 0
    for epoch in range(num_epochs):
        perm = np_rng.permutation(n).astype(np.int32)
        padded = np.zeros(steps * batch_size, np.int32)
        padded[:n] = perm
        mask = np.zeros(steps * batch_size, bool)
        mask[:n] = True
        lr = jnp.asarray(_multistep_lr(epoch), jnp.float32)
        params, state, opt_m, opt_v, opt_t, rng, _ = _train_epoch(
            params, state, opt_m, opt_v, opt_t, rng, x, y,
            jnp.asarray(padded.reshape(steps, batch_size)),
            jnp.asarray(mask.reshape(steps, batch_size)), lr,
        )
        val_auc = roc_auc_score(y_val, np.asarray(_predict(params, state, xv)))
        if val_auc - best_auc > min_delta:
            best_auc = val_auc
            best = (jax.tree_util.tree_map(np.asarray, params), jax.tree_util.tree_map(np.asarray, state))
            no_improve = 0
        else:
            no_improve += 1
        if no_improve >= patience:
            break
    if best is None:
        best = (jax.tree_util.tree_map(np.asarray, params), jax.tree_util.tree_map(np.asarray, state))
    return best


@jax.jit
def _predict_multi(params, state, x):
    """Per-seed prediction; x either shared (B, T, 1) or per-seed (S, B, T, 1)."""
    if x.ndim == 4:
        return jax.vmap(lstm_classifier.forward, in_axes=(0, 0, 0))(params, state, x)[0][..., 0]
    return jax.vmap(lambda p, s: _predict(p, s, x))(params, state)


def train_classifier_multi(
    Xs: np.ndarray,  # (S, n, T, 1)
    ys: np.ndarray,  # (S, n)
    Xvs: np.ndarray,  # (S, m, T, 1)
    yvs: np.ndarray,  # (S, m)
    seeds,
    num_epochs: int = NUM_EPOCHS,
    batch_size: int = 512,
    patience: int = 50,
    min_delta: float = 5e-4,
    mesh=None,
    return_stacked: bool = False,
    remat_chunk: Optional[int] = None,
    max_seed_chunk: Optional[int] = None,
):
    """All seeds trained simultaneously, a whole BLOCK of epochs per device
    dispatch — the seed vmap amortises the LSTM scan's sequential step
    latency and the epoch fusion amortises the dispatch round trip (the two
    costs that dominate the reference's 275-model sweep).  Validation AUC
    and the early-stopping carry live ON DEVICE (``_epoch_block_core``); the
    host only draws the epoch permutations (same np.random streams as the
    sequential path) and pulls one (S,) counter vector per block to decide
    when every seed has stopped.

    The device AUC is tie-corrected and matches sklearn's to f32 tolerance
    (tests/test_device_auc.py); an early-stop decision can flip on a ~1e-7
    AUC difference relative to the host-scored per-epoch loop — within the
    25-seed spread the harness reports.

    ``mesh``: shard the seed axis over the mesh's 'data' axis (the TPU
    counterpart of the reference training its 275 models sequentially,
    main_dl_classify.py:122-158); seeds pad to a mesh multiple with
    duplicates of the last seed, whose models are sliced off.
    ``return_stacked=True`` returns the (best_p, best_s) trees with their
    leading seed axis intact (device arrays) instead of per-seed host
    copies — callers that immediately re-batch the models (e.g. the chunked
    test scoring in ``dl_size_seed_sweep``) skip a device->host->device
    round trip of every model.
    ``remat_chunk``: chunked LSTM rematerialisation (see ``_epoch_core``) —
    lets seed_chunk=25 fit where the plain path is HBM-bound at ~5.
    ``max_seed_chunk``: per-device cap on the vmapped seed axis — wider
    calls split into balanced sequential groups whose per-seed streams are
    unchanged (results identical to the unsplit call).  ``None`` resolves to
    the measured ``DL_TPU_SEED_CHUNK`` on a real TPU (programs past ~20
    seeds at the production shape CRASH the worker unrecoverably — see the
    constant's calibration note) and to no cap elsewhere; pass 0 to disable
    the cap explicitly."""
    epoch_block_multi = _get_epoch_block_multi(remat_chunk)
    seeds = list(seeds)
    S_real = len(seeds)

    if max_seed_chunk is None:
        if jax.default_backend() == "tpu":
            # analytic HBM gate (core/hbm.py): the cap is computed from THIS
            # call's shapes, so bigger batches / longer sequences shrink it
            # instead of rediscovering the crash cliff; reproduces the
            # bisected DL_TPU_SEED_CHUNK = 8 at the calibration shape
            from ae_waveforms_tpu.core.hbm import seed_axis_cap

            max_seed_chunk = seed_axis_cap(
                Xs.shape[1], Xvs.shape[1], Xs.shape[2], batch_size,
                hidden_sizes=(128, 64, 64), param_count=152_400,
                remat_chunk=remat_chunk or 0,
            )
        else:
            max_seed_chunk = 0
    cap = max_seed_chunk * (mesh.shape["data"] if mesh is not None else 1)
    if cap and S_real > cap:
        n_groups = math.ceil(S_real / cap)
        base, extra = divmod(S_real, n_groups)
        sizes = [base + 1] * extra + [base] * (n_groups - extra)
        parts, o = [], 0
        for sz in sizes:
            sl = slice(o, o + sz)
            o += sz
            parts.append(train_classifier_multi(
                Xs[sl], ys[sl], Xvs[sl], yvs[sl], seeds[sl],
                num_epochs=num_epochs, batch_size=batch_size,
                patience=patience, min_delta=min_delta, mesh=mesh,
                return_stacked=return_stacked, remat_chunk=remat_chunk,
                max_seed_chunk=max_seed_chunk,
            ))
        if return_stacked:
            cat = lambda *xs: jnp.concatenate(xs)  # noqa: E731
            return (
                jax.tree_util.tree_map(cat, *[p[0] for p in parts]),
                jax.tree_util.tree_map(cat, *[p[1] for p in parts]),
            )
        return [m for p in parts for m in p]
    if mesh is not None:
        n_data = mesh.shape["data"]
        pad = (-S_real) % n_data
        if pad:
            Xs = np.concatenate([Xs, np.repeat(Xs[-1:], pad, axis=0)])
            ys = np.concatenate([ys, np.repeat(ys[-1:], pad, axis=0)])
            Xvs = np.concatenate([Xvs, np.repeat(Xvs[-1:], pad, axis=0)])
            yvs = np.concatenate([yvs, np.repeat(yvs[-1:], pad, axis=0)])
            seeds = seeds + [seeds[-1]] * pad
    S, n = ys.shape
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        seed_sharding = NamedSharding(mesh, PartitionSpec("data"))
        shard = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: jax.device_put(a, seed_sharding), t
        )
        # host arrays go straight to their shards in ONE transfer —
        # jnp.asarray-then-reshard would first commit the full array to one
        # device (transient whole-array HBM + a second inter-device copy)
        put = lambda a, dt: jax.device_put(  # noqa: E731
            np.asarray(a, dt), seed_sharding
        )
    else:
        shard = lambda t: t  # noqa: E731
        put = lambda a, dt: jnp.asarray(a, dt)  # noqa: E731
    keys = jax.vmap(jax.random.PRNGKey)(np.asarray(seeds, np.uint32))
    init_keys, run_keys = jax.vmap(jax.random.split, out_axes=1)(keys)
    params, state = shard(jax.vmap(lstm_classifier.init)(init_keys))
    opt_m = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt_v = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt_t = shard(jnp.zeros((S,), jnp.float32))
    rngs = shard(run_keys)

    x = put(Xs, np.float32)
    y = put(ys, np.float32)
    xv = put(Xvs, np.float32)
    yv = put(yvs, np.float32)
    steps = math.ceil(n / batch_size)
    host_rngs = [np.random.default_rng(int(s)) for s in seeds]

    # early-stop carry on device; a seed that never clears min_delta is
    # patched to its FINAL trained params after the loop (matching
    # train_classifier's fallback).  Distinct buffers — params and best_p
    # are both donated, and donation forbids aliased arguments.
    copy_tree = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)  # noqa: E731
    best_p, best_s = copy_tree(params), copy_tree(state)
    best_auc = shard(jnp.zeros((S,), jnp.float32))
    no_improve = shard(jnp.zeros((S,), jnp.int32))
    ever_improved = shard(jnp.zeros((S,), bool))
    patience_j = jnp.asarray(patience, jnp.int32)
    min_delta_j = jnp.asarray(min_delta, jnp.float32)

    # 153 = 9 x 17: the reference's epoch cap splits into equal blocks, so
    # one program shape serves the whole sweep; other caps compile at most
    # two block shapes (full + remainder)
    block = 17 if num_epochs % 17 == 0 else min(16, num_epochs)
    e0 = 0
    while e0 < num_epochs:
        E = min(block, num_epochs - e0)
        idx = np.zeros((S, E, steps * batch_size), np.int32)
        mask = np.zeros((S, E, steps * batch_size), bool)
        for e in range(E):
            for s in range(S):
                idx[s, e, :n] = host_rngs[s].permutation(n).astype(np.int32)
                mask[s, e, :n] = True
        lrs = jnp.asarray([_multistep_lr(e0 + e) for e in range(E)], jnp.float32)
        (params, state, opt_m, opt_v, opt_t, rngs,
         best_p, best_s, best_auc, no_improve, ever_improved, _) = epoch_block_multi(
            params, state, opt_m, opt_v, opt_t, rngs,
            best_p, best_s, best_auc, no_improve, ever_improved,
            x, y,
            put(idx.reshape(S, E, steps, batch_size), np.int32),
            put(mask.reshape(S, E, steps, batch_size), bool),
            lrs, xv, yv, patience_j, min_delta_j,
        )
        e0 += E
        if np.all(np.asarray(no_improve) >= patience):  # the per-block sync
            break

    # a seed that never improved keeps its FINAL trained params, matching
    # train_classifier's fallback (exact ever_improved flag; one jitted
    # dispatch — per-leaf eager wheres cost ~40 relay round trips)
    best_p, best_s = _never_improved_fallback(best_p, best_s, params, state, ever_improved)
    if S_real != S:  # drop mesh-padding duplicate seeds
        best_p = jax.tree_util.tree_map(lambda a: a[:S_real], best_p)
        best_s = jax.tree_util.tree_map(lambda a: a[:S_real], best_s)
    if return_stacked:
        return best_p, best_s
    best_p = jax.tree_util.tree_map(np.asarray, best_p)
    best_s = jax.tree_util.tree_map(np.asarray, best_s)
    return [
        (
            jax.tree_util.tree_map(lambda a: a[s], best_p),
            jax.tree_util.tree_map(lambda a: a[s], best_s),
        )
        for s in range(S_real)
    ]


def dl_size_seed_sweep(
    control_waves: np.ndarray,
    sick_waves: np.ndarray,
    sizes=tuple(DL_SIZES),
    n_seeds: int = 25,
    num_epochs: int = NUM_EPOCHS,
    out_dir: Optional[str] = None,
    save_models: bool = False,
    test_size: int = 250,
    vectorized: bool = False,
    seed_chunk: int = 25,
    mesh=None,
    remat_chunk: Optional[int] = None,
) -> List[Dict]:
    """The full size x seed harness on raw beats; returns summary records.

    ``vectorized=True`` trains seeds in vmapped chunks (one device program
    per epoch per chunk), identical per-seed data selection and schedules.
    ``mesh`` shards each chunk's seed axis over the mesh's 'data' axis
    (implies vectorized)."""
    if mesh is not None:
        vectorized = True
    control = np.asarray(control_waves)[:, :, None].astype(np.float32)
    sick = np.asarray(sick_waves)[:, :, None].astype(np.float32)
    ts = min(test_size, len(control) - 1, len(sick) - 1)
    X_test = np.concatenate([control[-ts:], sick[-ts:]], axis=0)
    y_test = np.concatenate([np.zeros(ts), np.ones(ts)])
    control_train, sick_train = control[:-ts], sick[:-ts]

    summary = []
    for size in sizes:
        size = min(size, len(control_train), len(sick_train))
        aucs = []

        def seed_data(seed):
            rng = np.random.default_rng(seed + 42)
            idx_c = rng.choice(len(control_train), size, replace=False)
            idx_s = rng.choice(len(sick_train), size, replace=False)
            X = np.concatenate([control_train[idx_c], sick_train[idx_s]], axis=0)
            yv = np.concatenate([np.zeros(size), np.ones(size)])
            return train_test_split(X, yv, test_size=0.2, stratify=yv, random_state=seed)

        def maybe_save(seed, params, state, i=None):
            """``i`` selects seed ``i`` out of stacked device trees — sliced
            (and pulled to host) only when saving actually happens."""
            if save_models and out_dir:
                from ae_waveforms_tpu.train.checkpoint import save_state

                if i is not None:
                    pick = lambda a: np.asarray(a[i])  # noqa: E731
                    params = jax.tree_util.tree_map(pick, params)
                    state = jax.tree_util.tree_map(pick, state)
                os.makedirs(os.path.join(out_dir, f"size_{size}"), exist_ok=True)
                save_state(os.path.join(out_dir, f"size_{size}", f"model_seed_{seed}.npz"),
                           {"params": params, "state": state})

        if vectorized:
            for c0 in range(0, n_seeds, seed_chunk):
                chunk = list(range(c0, min(c0 + seed_chunk, n_seeds)))
                per = [seed_data(s) for s in chunk]
                Xs = np.stack([p[0] for p in per])
                Xvs = np.stack([p[1] for p in per])
                ys = np.stack([p[2] for p in per])
                yvs = np.stack([p[3] for p in per])
                best_p, best_s = train_classifier_multi(
                    Xs, ys, Xvs, yvs, chunk, num_epochs=num_epochs,
                    mesh=mesh, return_stacked=True, remat_chunk=remat_chunk,
                )
                # one batched test-scoring dispatch for the whole chunk,
                # straight from the stacked device trees (no host round trip)
                preds = np.asarray(_predict_multi(best_p, best_s, jnp.asarray(X_test)))
                for i, s in enumerate(chunk):
                    aucs.append(roc_auc_score(y_test, preds[i]))
                    maybe_save(s, best_p, best_s, i=i)
        else:
            for seed in range(n_seeds):
                Xtr, Xva, ytr, yva = seed_data(seed)
                params, state = train_classifier(Xtr, ytr, Xva, yva, seed, num_epochs=num_epochs)
                preds = np.asarray(_predict(params, state, jnp.asarray(X_test)))
                aucs.append(roc_auc_score(y_test, preds))
                maybe_save(seed, params, state)
        rec = {
            "size": size,
            "median_auc": float(np.median(aucs)),
            "q1": float(np.percentile(aucs, 25)),
            "q3": float(np.percentile(aucs, 75)),
            "aucs": aucs,
        }
        summary.append(rec)
        print(f"Size: {size}, Median AUC: {rec['median_auc']:.4f}, IQR: ({rec['q1']:.4f}, {rec['q3']:.4f})")
        if out_dir:
            import csv

            os.makedirs(os.path.join(out_dir, f"size_{size}"), exist_ok=True)
            with open(os.path.join(out_dir, f"size_{size}", f"aucs_size_{size}.csv"), "w", newline="") as f:
                wr = csv.writer(f)
                wr.writerow(["seed", "auc"])
                for s, a in enumerate(aucs):
                    wr.writerow([s, a])
    if out_dir:
        import csv

        with open(os.path.join(out_dir, "summary_auc_stats.csv"), "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["size", "median_auc", "q1", "q3"])
            for r in summary:
                wr.writerow([r["size"], r["median_auc"], r["q1"], r["q3"]])
    return summary
