"""Multi-configuration AE training: S seed configurations of one
architecture trained SIMULTANEOUSLY in a single vmapped device program.

Why this exists: the flagship LSTM-AE at the reference's batch 128
(main_ae.py:58-66) is latency-bound on TPU — the 320-step scan's serial
chain, not FLOPs, sets the step time (BENCHMARKS.md round 3: wavefront tie,
fused-stack loss, batch-scaling table), so one training run leaves the MXU
mostly idle.  The reference's own analysis consumes TWO trained AEs
(analysis_performance_traditional_vs_ae.py:226-230: AUT-231 d=10 seed 3,
AUT-296 d=20 seed 7) plus 25-seed studies, each a separate sequential run
(main_ae.py trains one model per process).  Training the S configurations
as one vmapped program turns the idle width into throughput — the same
epoch-block pattern proven in classify/dl.py for the DL-classifier sweep.

Semantics (one deviation, documented): everything follows train/loop.py —
the 1-step warm chunk then validation every ``validation_interval`` steps
per epoch (run_train.py:317-319), early stopping with best-snapshot
retention (:30-103, on-device carries here), StepLR halving on validation
plateaus (:343-348) — except that all S configurations share ONE
train/val/test split drawn from ``cfg.seed`` (a fixed-split seed study;
``main_train`` redraws the patient split per seed).  Per-configuration
streams: init key, shuffle permutations, and dropout keys are all keyed by
each configuration's own seed; an optional per-configuration learning-rate
multiplier vmaps over the lr axis too.

Configurations with DIFFERENT latent sizes have different parameter shapes
and cannot share one vmap — group per latent size and call once per group
(`train_ae_multi_grouped`).
"""

from __future__ import annotations

import glob
import math
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.core.schema import ArraySet, load_arrays
from ae_waveforms_tpu.models.registry import MODEL_REGISTRY
from ae_waveforms_tpu.parallel.mesh import data_mesh
from ae_waveforms_tpu.train.data import layout_waves, split_datasets
from ae_waveforms_tpu.train.loop import (
    _batched_indices,
    _elementwise_loss,
    _finalize_loss,
    _lr_schedule,
    effective_epochs,
)
from ae_waveforms_tpu.train.optimizers import make_optimizer

__all__ = ["train_ae_multi", "train_ae_multi_grouped", "MultiTrainResult"]


@dataclass
class MultiTrainResult:
    """Stacked (leading config axis) outcome of one multi-config run."""

    seeds: List[int]
    best_params: dict  # stacked pytree, leading axis = config
    best_val: np.ndarray  # (S,) best validation loss per config
    ever_improved: np.ndarray  # (S,) whether a best snapshot was ever taken
    stopped: np.ndarray  # (S,) early-stopped flags at exit
    train_losses: np.ndarray  # (total_steps, S)
    val_losses: np.ndarray  # (n_validations, S)
    run_dirs: Optional[List[str]] = None  # per-config run dirs (save_runs=True)
    lr_multipliers: Optional[np.ndarray] = None  # (S,) per-config lr scale

    def params_for(self, i: int):
        return jax.tree_util.tree_map(lambda a: np.asarray(a[i]), self.best_params)


def _make_block_multi(mdef, optimizer, loss_kind, schedule, is_steplr,
                      val_delay, patience, dropout_rate):
    """Build the jitted, vmapped multi-config block runner.

    One BLOCK = several validation segments scanned inside one dispatch;
    one SEGMENT = ``n_steps`` fused train steps (the train/loop.py chunk
    body) + the validation pass + the early-stop / plateau carry update,
    all per configuration under vmap.  A stopped configuration keeps
    training harmlessly (its best snapshot and counters are frozen), the
    classify/dl.py pattern — the host stops dispatching once every
    configuration's flag is set, and ``main_train``'s returned artifact
    (the best snapshot) is unaffected by the extra steps.
    """

    def segment_core(params, opt_state, rng, best_p, best_val, patience_ctr,
                     lr_valid_ctr, lr_events, stopped, ever_improved,
                     lr_mult, data_x, idx_seg, mask_seg,
                     val_x, val_idx, val_mask, step0, do_val):
        lr_scale = lr_mult * (
            jnp.power(jnp.asarray(0.5, jnp.float32), lr_events)
            if is_steplr else jnp.asarray(1.0, jnp.float32)
        )

        def one_step(carry, inp):
            params, opt_state, rng = carry
            idx, mask, local = inp
            rng, kstep = jax.random.split(rng)
            lr_t = schedule(step0 + local) * lr_scale
            x = jnp.take(data_x, idx, axis=0)
            w = mask.astype(x.dtype)

            def loss_fn(p):
                pred = mdef.forward(p, x, train=True, rng=kstep, rate=dropout_rate)
                elem = _elementwise_loss(loss_kind, pred, x)
                per = jnp.mean(elem.reshape(elem.shape[0], -1), axis=1)
                total = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
                return _finalize_loss(loss_kind, total, 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            opt_state_lr = opt_state._replace(
                hyperparams={**opt_state.hyperparams, "learning_rate": lr_t}
            )
            updates, opt_state2 = optimizer.update(grads, opt_state_lr, params)
            params2 = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return (params2, opt_state2, rng), (loss, lr_t)

        n_steps = idx_seg.shape[0]
        (params, opt_state, rng), (losses, lrs) = jax.lax.scan(
            one_step, (params, opt_state, rng),
            (idx_seg, mask_seg, jnp.arange(n_steps)),
        )

        # the reference validates only when the local step index is a
        # multiple of V (run_train.py:317-319) — an epoch's final partial
        # segment usually is NOT one, so ``do_val`` (static) skips both the
        # validation pass and every ES/plateau carry update there
        if not do_val:
            return (params, opt_state, rng, best_p, best_val, patience_ctr,
                    lr_valid_ctr, lr_events, stopped, ever_improved), (
                        losses, lrs, jnp.full((), jnp.nan))

        # validation pass (train/loop.py make_validator body)
        def vbody(carry, inp):
            total, count = carry
            bidx, bmask = inp
            x = jnp.take(val_x, bidx, axis=0)
            pred = mdef.forward(params, x, train=False)
            elem = _elementwise_loss(loss_kind, pred, x)
            w = bmask.astype(x.dtype)[:, None, None]
            total = total + jnp.sum(elem * w)
            count = count + jnp.sum(w) * elem.shape[1] * elem.shape[2]
            return (total, count), None

        (tot, cnt), _ = jax.lax.scan(
            vbody, (jnp.zeros(()), jnp.zeros(())), (val_idx, val_mask)
        )
        val_loss = _finalize_loss(loss_kind, tot, cnt)

        act = ~stopped
        # plateau counter reads the PRE-update minimum and never resets on
        # improvement, only when it fires (run_train.py:343-348)
        if is_steplr and val_delay > 0:
            grew = act & (val_loss >= best_val)
            lr_valid_ctr = jnp.where(grew, lr_valid_ctr + 1, lr_valid_ctr)
            fire = act & (lr_valid_ctr == val_delay)
            lr_events = jnp.where(fire, lr_events + 1, lr_events)
            lr_valid_ctr = jnp.where(fire, 0, lr_valid_ctr)

        improved = act & (val_loss < best_val)
        best_p = jax.tree_util.tree_map(
            lambda b, n: jnp.where(improved, n, b), best_p, params
        )
        best_val = jnp.where(improved, val_loss, best_val)
        ever_improved = ever_improved | improved
        patience_ctr = jnp.where(
            improved, 0, jnp.where(act, patience_ctr + 1, patience_ctr)
        )
        # main_train checks the counter only on NON-improving validations
        # (run_train.py:335-340), so an improving one never stops
        stopped = stopped | (act & ~improved & (patience_ctr >= patience))
        return (params, opt_state, rng, best_p, best_val, patience_ctr,
                lr_valid_ctr, lr_events, stopped, ever_improved), (losses, lrs, val_loss)

    def make_runner(do_val):
        def block_core(params, opt_state, rng, best_p, best_val, patience_ctr,
                       lr_valid_ctr, lr_events, stopped, ever_improved,
                       lr_mult, data_x, idx_blk, mask_blk,
                       val_x, val_idx, val_mask, step0s):
            def seg(carry, inp):
                idx_seg, mask_seg, step0 = inp
                return segment_core(*carry, lr_mult, data_x, idx_seg, mask_seg,
                                    val_x, val_idx, val_mask, step0, do_val)

            carry = (params, opt_state, rng, best_p, best_val, patience_ctr,
                     lr_valid_ctr, lr_events, stopped, ever_improved)
            carry, (losses, lrs, val_losses) = jax.lax.scan(
                seg, carry, (idx_blk, mask_blk, step0s)
            )
            return carry + (losses, lrs, val_losses)

        # leading config axis on the train/ES carries, lr multiplier and the
        # per-config index streams; the dataset, validation batches and step
        # counters are shared
        return jax.jit(
            jax.vmap(
                block_core,
                in_axes=(0,) * 11 + (None, 0, 0, None, None, None, None),
            ),
            donate_argnums=tuple(range(10)),
        )

    runners = {True: make_runner(True), False: make_runner(False)}
    return lambda *args, do_val: runners[do_val](*args)


@jax.jit
def _never_improved_fallback(best_p, params, ever_improved):
    """Configs whose validation never improved keep their FINAL params —
    main_train's best_path-is-None fallback (run_train.py:537-538)."""
    S = ever_improved.shape[0]
    never = ~ever_improved

    def pick(b, f):
        return jnp.where(never.reshape((S,) + (1,) * (f.ndim - 1)), f, b)

    return jax.tree_util.tree_map(pick, best_p, params)


def train_ae_multi(
    cfg: TrainConfig,
    seeds: Sequence[int],
    arrays: Optional[ArraySet] = None,
    lr_multipliers: Optional[Sequence[float]] = None,
    mesh=None,
    max_steps: Optional[int] = None,
    segments_per_dispatch: int = 8,
    results_dir: Optional[str] = None,
    save_runs: bool = False,
) -> MultiTrainResult:
    """Train ``len(seeds)`` configurations of ``cfg.model_class`` at
    ``cfg.latent_size`` simultaneously; see the module docstring for the
    exact semantics.  ``lr_multipliers`` optionally scales each
    configuration's learning rate (a second sweep axis at zero extra
    dispatches).  ``mesh`` shards the configuration axis over the mesh's
    'data' devices (padding with duplicates of the last seed).
    ``max_steps`` bounds the per-config step count (tests/benchmarks).
    ``save_runs`` writes each configuration to its own
    ``<cfg.results_dir>/networks_autoencoder/<stamp>-d<latent>-s<seed>[-lr<mult>]``
    run dir
    (best-params checkpoint + split masks), so ``main_test`` / ``Scorer``
    consume a multi-run exactly like a ``main_train`` run; the dirs come
    back in ``MultiTrainResult.run_dirs``.
    """
    seeds = [int(s) for s in seeds]
    S_real = len(seeds)
    if S_real == 0:
        raise ValueError("need at least one seed")
    lr_mults = list(lr_multipliers) if lr_multipliers is not None else [1.0] * S_real
    if len(lr_mults) != S_real:
        raise ValueError("lr_multipliers must match seeds")

    mdef = MODEL_REGISTRY[cfg.model_class]
    if arrays is None:
        arrays = load_arrays(cfg.dataset_dir)

    # ONE split for every configuration, drawn from cfg.seed exactly as
    # main_train draws it (np.random.seed then the patient-level choice)
    np.random.seed(cfg.seed)
    mask_dir = results_dir or tempfile.mkdtemp(prefix="ae_multi_")
    os.makedirs(mask_dir, exist_ok=True)
    tr_mask, va_mask, te_mask = split_datasets(
        arrays.info, cfg.dataset_dir, mask_dir,
        cfg.split_size_val, cfg.split_size_test, cfg.nr_train_ids,
    )
    n_train, n_val = int(tr_mask.sum()), int(va_mask.sum())
    if n_train == 0 or n_val == 0:
        raise ValueError(f"empty split (train={n_train}, val={n_val})")

    if mesh is None and cfg.n_devices:
        mesh = data_mesh(cfg.n_devices, cfg.model_parallel)
    pad = 0
    if mesh is not None:
        n_data = mesh.shape["data"]
        pad = (-S_real) % n_data
        seeds = seeds + [seeds[-1]] * pad
        lr_mults = lr_mults + [lr_mults[-1]] * pad
    S = len(seeds)

    if mesh is not None:
        cfg_sharding = NamedSharding(mesh, P("data"))
        repl_sharding = NamedSharding(mesh, P())
        shard = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: jax.device_put(a, cfg_sharding), t
        )
        put_repl = lambda a: jax.device_put(a, repl_sharding)  # noqa: E731
        put_cfg = lambda a: jax.device_put(np.asarray(a), cfg_sharding)  # noqa: E731
    else:
        shard = lambda t: t  # noqa: E731
        put_repl = jnp.asarray
        put_cfg = jnp.asarray

    x_all = layout_waves(np.asarray(arrays.waves, np.float32), mdef.channel_first)
    train_x = put_repl(x_all[tr_mask])
    val_x = put_repl(x_all[va_mask])

    # per-config init/run keys: the main_train chain (PRNGKey(seed) ->
    # split -> k_init for init, carry rng for the step dropout keys)
    keys = jax.vmap(jax.random.PRNGKey)(np.asarray(seeds, np.uint32))
    run_keys, init_keys = jax.vmap(jax.random.split, out_axes=1)(keys)
    params = shard(jax.vmap(lambda k: mdef.init(k, cfg.latent_size, cfg.dropout))(init_keys))
    rngs = shard(run_keys)

    optimizer = make_optimizer(
        cfg.optimizer_type, cfg.lr, cfg.weight_decay,
        momentum=cfg.sgd_momentum, ranger_momentum=cfg.ranger_momentum,
        ranger_threshold=cfg.ranger_threshold,
    )
    opt_state = shard(jax.vmap(optimizer.init)(params))

    steps_per_epoch = math.ceil(n_train / cfg.batch_size)
    schedule, is_steplr = _lr_schedule(cfg, steps_per_epoch)
    run_block = _make_block_multi(
        mdef, optimizer, cfg.loss, schedule, is_steplr,
        cfg.lr_scheduler_val_delay, cfg.early_stopping_patience, cfg.dropout,
    )

    # early-stop / plateau carries, all on device
    copy_tree = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)  # noqa: E731
    best_p = copy_tree(params)
    best_val = put_cfg(np.full(S, np.inf, np.float32))
    patience_ctr = put_cfg(np.zeros(S, np.int32))
    lr_valid_ctr = put_cfg(np.zeros(S, np.int32))
    lr_events = put_cfg(np.zeros(S, np.int32))
    stopped = put_cfg(np.zeros(S, bool))
    ever_improved = put_cfg(np.zeros(S, bool))
    lr_mult_dev = put_cfg(np.asarray(lr_mults, np.float32))

    val_idx, val_m = _batched_indices(n_val, cfg.batch_size, np.arange(n_val, dtype=np.int32))
    val_idx_j, val_m_j = jnp.asarray(val_idx), jnp.asarray(val_m)

    host_rngs = [np.random.default_rng(s) for s in seeds]
    epochs = effective_epochs(cfg, n_train)
    V = cfg.validation_interval

    train_hist: List[np.ndarray] = []
    val_hist: List[np.ndarray] = []
    global_step = 0
    done = False
    for _epoch in range(1, epochs + 1):
        if done:
            break
        # per-config permutation of the SHARED split (per-seed host streams)
        idx_all = np.zeros((S, steps_per_epoch, cfg.batch_size), np.int32)
        mask_all = np.zeros((S, steps_per_epoch, cfg.batch_size), bool)
        for s in range(S):
            perm = (
                host_rngs[s].permutation(n_train).astype(np.int32)
                if cfg.train_shuffle
                else np.arange(n_train, dtype=np.int32)
            )
            idx_all[s], mask_all[s] = _batched_indices(n_train, cfg.batch_size, perm)

        # segment layout replicating "validate after local step 0, V, 2V, ...":
        # a segment validates only if its LAST local step is a V multiple
        # (run_train.py:317-319 — the final partial segment usually isn't)
        bounds = [(0, 1)]
        local = 1
        while local < steps_per_epoch:
            n = min(V, steps_per_epoch - local)
            bounds.append((local, n))
            local += n
        do_vals = [((lo + n - 1) % V) == 0 for lo, n in bounds]

        b0 = 0
        while b0 < len(bounds) and not done:
            # group CONSECUTIVE (equal-length, same-validation) segments
            # into one dispatch
            n_steps = bounds[b0][1]
            do_val = do_vals[b0]
            b1 = b0
            while (b1 < len(bounds) and bounds[b1][1] == n_steps
                   and do_vals[b1] == do_val and b1 - b0 < segments_per_dispatch):
                b1 += 1
            segs = bounds[b0:b1]
            idx_blk = np.stack(
                [idx_all[:, lo:lo + n, :] for lo, n in segs], axis=1
            )  # (S, n_seg, n_steps, B)
            mask_blk = np.stack([mask_all[:, lo:lo + n, :] for lo, n in segs], axis=1)
            step0s = jnp.asarray(
                [global_step + sum(n for _, n in segs[:k]) for k in range(len(segs))],
                jnp.int32,
            )
            (params, opt_state, rngs, best_p, best_val, patience_ctr,
             lr_valid_ctr, lr_events, stopped, ever_improved,
             losses, _lrs, vlosses) = run_block(
                params, opt_state, rngs, best_p, best_val, patience_ctr,
                lr_valid_ctr, lr_events, stopped, ever_improved,
                lr_mult_dev, train_x,
                put_cfg(idx_blk), put_cfg(mask_blk),
                val_x, val_idx_j, val_m_j, step0s,
                do_val=do_val,
            )
            global_step += sum(n for _, n in segs)
            # (S, n_seg, n_steps) -> (steps, S); (S, n_seg) -> (n_seg, S)
            train_hist.append(
                np.asarray(losses).transpose(1, 2, 0).reshape(-1, S)
            )
            if do_val:
                val_hist.append(np.asarray(vlosses).T)
            b0 = b1
            if bool(np.all(np.asarray(stopped))):
                done = True
            if max_steps is not None and global_step >= max_steps:
                done = True

    best_p = _never_improved_fallback(best_p, params, ever_improved)
    if pad:
        best_p = jax.tree_util.tree_map(lambda a: a[:S_real], best_p)
    result = MultiTrainResult(
        seeds=seeds[:S_real],
        best_params=best_p,
        best_val=np.asarray(best_val)[:S_real],
        ever_improved=np.asarray(ever_improved)[:S_real],
        stopped=np.asarray(stopped)[:S_real],
        train_losses=np.concatenate(train_hist, axis=0)[:, :S_real],
        val_losses=np.concatenate(val_hist, axis=0)[:, :S_real],
        lr_multipliers=np.asarray(lr_mults[:S_real], np.float32),
    )
    if save_runs:
        result.run_dirs = _save_multi_runs(cfg, result, mask_dir)
    return result


def _save_multi_runs(cfg: TrainConfig, result: MultiTrainResult, mask_dir: str) -> List[str]:
    """One ``main_train``-shaped run dir per configuration: the best-params
    checkpoint under the rolling-best filename ``latest_best`` globs for,
    plus the shared split masks (``indices_{split}_*.npy``) ``main_test`` /
    the analysis CLI read from the run dir.  The full optimizer state is
    not written — multi-runs are not mid-run resumable (use ``main_train``
    with ``resume_dir`` for that)."""
    from ae_waveforms_tpu.train import checkpoint as ckpt

    stamp = time.strftime("%y-%m-%d-%H%M%S")
    masks = glob.glob(os.path.join(mask_dir, "indices_*_*.npy"))
    mults = result.lr_multipliers
    tag_lr = mults is not None and not np.allclose(mults, 1.0)
    dirs: List[str] = []
    for i, seed in enumerate(result.seeds):
        # latent tag first: grouped multi-latent runs can share a stamp and
        # a seed across groups (the -s / -lr suffix checks stay valid)
        name = f"{stamp}-d{cfg.latent_size}-s{seed}"
        if tag_lr:  # lr-sweep configs share seeds; the multiplier is the key
            name += f"-lr{float(mults[i]):g}"
        run_dir = os.path.join(cfg.results_dir, "networks_autoencoder", name)
        os.makedirs(run_dir, exist_ok=True)
        val = float(np.around(result.best_val[i], 4))
        ckpt.save_state(
            os.path.join(run_dir, f"model_min_val_loss-{val}_params.npz"),
            result.params_for(i),
        )
        for m in masks:
            dest = os.path.join(run_dir, os.path.basename(m))
            if os.path.abspath(m) != os.path.abspath(dest):
                shutil.copy2(m, dest)
        dirs.append(run_dir)
    return dirs


def train_ae_multi_grouped(
    cfg: TrainConfig,
    configs: Sequence[Tuple],  # (latent_size, seed[, lr_multiplier]) each
    **kwargs,
) -> Dict[int, MultiTrainResult]:
    """``train_ae_multi`` over configurations spanning SEVERAL latent sizes.

    Different latent sizes mean different parameter shapes, which one vmap
    cannot batch — so configurations are grouped per latent size and each
    group trains as one vmapped program (the reference's analysis pair is
    exactly this shape: AUT-231 d=10 + AUT-296 d=20,
    analysis_performance_traditional_vs_ae.py:226-230).  Each config is
    ``(latent_size, seed)`` or ``(latent_size, seed, lr_multiplier)``.
    Returns ``{latent_size: MultiTrainResult}``; ``kwargs`` pass through to
    ``train_ae_multi`` (``save_runs=True`` gives every configuration its
    own run dir across all groups)."""
    groups: Dict[int, Tuple[List[int], List[float]]] = {}
    for c in configs:
        latent, seed = int(c[0]), int(c[1])
        mult = float(c[2]) if len(c) > 2 else 1.0
        seeds, mults = groups.setdefault(latent, ([], []))
        seeds.append(seed)
        mults.append(mult)
    return {
        latent: train_ae_multi(replace(cfg, latent_size=latent), seeds,
                               lr_multipliers=mults, **kwargs)
        for latent, (seeds, mults) in groups.items()
    }
