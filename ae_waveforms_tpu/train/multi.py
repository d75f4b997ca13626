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
import json
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
from ae_waveforms_tpu.train.data import draw_split_masks, layout_waves, split_datasets
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
        # per-config train AND validation index streams; the dataset arrays
        # and step counters are shared (per-config splits index the full
        # dataset with absolute rows, so even distinct memberships batch)
        return jax.jit(
            jax.vmap(
                block_core,
                in_axes=(0,) * 11 + (None, 0, 0, None, 0, 0, None),
            ),
            donate_argnums=tuple(range(10)),
        )

    runners = {True: make_runner(True), False: make_runner(False)}
    return lambda *args, do_val: runners[do_val](*args)


def _config_axis_cap(model_class: str, latent: int, batch: int,
                     n_rows: int, seq_len: int) -> int:
    """Per-device HBM feasibility cap on the vmapped config axis
    (core/hbm.py, safety=1: this is crash avoidance, not throughput
    shaping — the measured flagship optimum S=8 sits well inside).  The
    conv family has no scan and ~2-orders-smaller activations: uncapped."""
    if "LSTM" not in model_class:
        return 0
    from ae_waveforms_tpu.core.hbm import seed_axis_cap

    ins = (1, 128, 64, latent, 64, 128)
    hidden = (128, 64, latent, 64, 128, 1)
    p_count = sum(4 * h * (i + h + 2) for i, h in zip(ins, hidden)) + 2
    shared = 4 * n_rows * seq_len  # ONE replicated dataset for all configs
    return seed_axis_cap(0, 0, seq_len, batch, hidden, p_count,
                         remat_chunk=0, safety=1.0, shared_bytes=shared)


def _merge_multi_results(parts: List[MultiTrainResult]) -> MultiTrainResult:
    """Concatenate per-group results back into one study (groups that
    early-stopped sooner NaN-pad their history tails)."""
    def padcat(arrs: List[np.ndarray]) -> np.ndarray:
        L = max(a.shape[0] for a in arrs)
        return np.concatenate(
            [np.pad(a.astype(np.float32), ((0, L - a.shape[0]), (0, 0)),
                    constant_values=np.nan) for a in arrs], axis=1)

    best_params = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
        *[p.best_params for p in parts])
    run_dirs = None
    if parts[0].run_dirs is not None:
        run_dirs = [d for p in parts for d in p.run_dirs]
    return MultiTrainResult(
        seeds=[s for p in parts for s in p.seeds],
        best_params=best_params,
        best_val=np.concatenate([p.best_val for p in parts]),
        ever_improved=np.concatenate([p.ever_improved for p in parts]),
        stopped=np.concatenate([p.stopped for p in parts]),
        train_losses=padcat([p.train_losses for p in parts]),
        val_losses=padcat([p.val_losses for p in parts]),
        run_dirs=run_dirs,
        lr_multipliers=np.concatenate([p.lr_multipliers for p in parts]),
    )


def _multi_ckpt_paths(dir_: str, latent_size: int, tag: str = "") -> Tuple[str, str]:
    # keyed by latent size (and group tag for auto-split wide studies) so
    # grouped runs don't overwrite each other's checkpoints in one
    # results_dir
    base = os.path.join(dir_, f"multi_checkpoint_d{latent_size}{tag}")
    return base + ".npz", base + ".meta.json"


def _save_multi_ckpt(dir_: str, carries: Tuple, train_hist, val_hist,
                     meta: dict) -> None:
    """Atomically persist the FULL stacked multi-config train state: every
    device carry (params, optimizer state, rng keys, best snapshots,
    early-stop/plateau counters) plus the loss histories and the host loop
    position.  tmp-file + rename, so a kill mid-write leaves the previous
    checkpoint intact."""
    npz_path, meta_path = _multi_ckpt_paths(dir_, meta["latent_size"],
                                            meta.get("tag", ""))
    leaves = jax.tree_util.tree_leaves(carries)
    arrs = {f"c{i}": np.asarray(l) for i, l in enumerate(leaves)}
    S = len(meta["seeds"])
    arrs["thist"] = (np.concatenate(train_hist, axis=0)
                     if train_hist else np.zeros((0, S), np.float32))
    arrs["vhist"] = (np.concatenate(val_hist, axis=0)
                     if val_hist else np.zeros((0, S), np.float32))
    tmp = npz_path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, npz_path)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)


def _load_multi_ckpt(dir_: str, carry_template: Tuple, seeds, lr_mults,
                     cfg: TrainConfig, n_train: int,
                     tag: str = "") -> Tuple[Tuple, dict]:
    """Restore a ``_save_multi_ckpt`` state.  The carry pytree is rebuilt
    against the freshly initialised template (same cfg + seeds => identical
    structure/shapes), and the run fingerprint is checked so a checkpoint
    can never silently resume a DIFFERENT study."""
    npz_path, meta_path = _multi_ckpt_paths(dir_, cfg.latent_size, tag)
    with open(meta_path) as f:
        meta = json.load(f)
    fingerprint = dict(seeds=seeds, lr_mults=[float(m) for m in lr_mults],
                       model_class=cfg.model_class,
                       latent_size=cfg.latent_size,
                       batch_size=cfg.batch_size, n_train=n_train)
    for k, v in fingerprint.items():
        if meta.get(k) != v:
            raise ValueError(
                f"multi checkpoint mismatch on {k!r}: saved {meta.get(k)!r}, "
                f"this run {v!r} — refusing to resume a different study")
    data = np.load(npz_path)
    tpl_leaves, treedef = jax.tree_util.tree_flatten(carry_template)
    loaded = [data[f"c{i}"] for i in range(len(tpl_leaves))]
    for tpl, got in zip(tpl_leaves, loaded):
        if tuple(tpl.shape) != tuple(got.shape):
            raise ValueError(
                f"multi checkpoint leaf shape mismatch: saved {got.shape}, "
                f"template {tpl.shape}")
    meta["thist"] = data["thist"]
    meta["vhist"] = data["vhist"]
    return jax.tree_util.tree_unflatten(treedef, loaded), meta


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
    per_config_splits: bool = False,
    checkpoint_every: Optional[int] = None,
    resume_dir: Optional[str] = None,
    max_config_chunk: Optional[int] = None,
    _ckpt_tag: str = "",
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

    ``per_config_splits=True`` redraws the patient-level split UNDER EACH
    CONFIG'S SEED — what a sequential seed study actually does
    (main_ae.py:128-133 seeds numpy globally before split_datasets, so
    every seed sees different train/val/test membership); the default
    shares one ``cfg.seed`` split (a fixed-split study).  To keep one
    fixed-shape vmapped program, per-config memberships are size-equalised
    to the smallest per-split count across configs (tail rows of the larger
    draws dropped — the only deviation, documented in BENCHMARKS.md with
    the measured shared- vs per-config spread).

    ``checkpoint_every=K`` writes the full stacked train state (params +
    optimizer + rng + early-stop carries + histories) to
    ``results_dir/multi_checkpoint.npz`` every K dispatches, atomically;
    ``resume_dir`` restores it and continues BIT-COMPATIBLY — a crashed
    25-seed study resumes from its last checkpoint instead of from zero
    (the DL crash cliff proved mid-sweep worker death is a real mode).
    """
    seeds = [int(s) for s in seeds]
    S_real = len(seeds)
    if S_real == 0:
        raise ValueError("need at least one seed")
    lr_mults = list(lr_multipliers) if lr_multipliers is not None else [1.0] * S_real
    if len(lr_mults) != S_real:
        raise ValueError("lr_multipliers must match seeds")
    if checkpoint_every is not None and results_dir is None:
        raise ValueError("checkpoint_every needs results_dir (checkpoint home)")

    mdef = MODEL_REGISTRY[cfg.model_class]
    if arrays is None:
        arrays = load_arrays(cfg.dataset_dir)

    if mesh is None and cfg.n_devices:
        mesh = data_mesh(cfg.n_devices, cfg.model_parallel)

    # analytic HBM feasibility gate (core/hbm.py): a config axis wider than
    # the per-device budget splits into balanced sequential groups BEFORE
    # dispatch — the DL crash cliff proved the alternative is an
    # unrecoverable worker death mid-study
    if max_config_chunk is None:
        max_config_chunk = (
            _config_axis_cap(cfg.model_class, cfg.latent_size,
                             cfg.batch_size, len(arrays.info),
                             int(arrays.waves.shape[1]))
            if jax.default_backend() == "tpu" else 0
        )
    allowed = max_config_chunk * (mesh.shape["data"] if mesh is not None else 1)
    if max_config_chunk and S_real > allowed:
        n_groups = math.ceil(S_real / allowed)
        base, extra = divmod(S_real, n_groups)
        sizes = [base + 1] * extra + [base] * (n_groups - extra)
        parts, o = [], 0
        for gi, sz in enumerate(sizes):
            sl = slice(o, o + sz)
            o += sz
            parts.append(train_ae_multi(
                cfg, seeds[sl], arrays=arrays, lr_multipliers=lr_mults[sl],
                mesh=mesh, max_steps=max_steps,
                segments_per_dispatch=segments_per_dispatch,
                results_dir=results_dir, save_runs=save_runs,
                per_config_splits=per_config_splits,
                checkpoint_every=checkpoint_every, resume_dir=resume_dir,
                max_config_chunk=max_config_chunk,
                _ckpt_tag=f"{_ckpt_tag}-g{gi}",
            ))
        return _merge_multi_results(parts)

    mask_dir = results_dir or tempfile.mkdtemp(prefix="ae_multi_")
    os.makedirs(mask_dir, exist_ok=True)
    pad = 0
    if mesh is not None:
        n_data = mesh.shape["data"]
        pad = (-S_real) % n_data
        seeds = seeds + [seeds[-1]] * pad
        lr_mults = lr_mults + [lr_mults[-1]] * pad
    S = len(seeds)

    per_masks = None
    train_rows = val_rows = None
    if per_config_splits:
        # the sequential chain under each seed: np.random.seed(seed) then
        # the patient-level draw (duplicated seeds redraw identically)
        per_masks = []
        for s_ in seeds:
            np.random.seed(s_)
            per_masks.append(draw_split_masks(
                arrays.info[:, 0], cfg.split_size_val, cfg.split_size_test,
                cfg.nr_train_ids,
            ))
        n_train = min(int(m["train"].sum()) for m in per_masks)
        n_val = min(int(m["val"].sum()) for m in per_masks)
        if n_train == 0 or n_val == 0:
            raise ValueError(f"empty split (train={n_train}, val={n_val})")
        # absolute dataset rows per config, size-equalised (see docstring)
        train_rows = np.stack(
            [np.flatnonzero(m["train"])[:n_train] for m in per_masks]
        ).astype(np.int32)
        val_rows = np.stack(
            [np.flatnonzero(m["val"])[:n_val] for m in per_masks]
        ).astype(np.int32)
    else:
        # ONE split for every configuration, drawn from cfg.seed exactly as
        # main_train draws it (np.random.seed then the patient-level choice)
        np.random.seed(cfg.seed)
        tr_mask, va_mask, te_mask = split_datasets(
            arrays.info, cfg.dataset_dir, mask_dir,
            cfg.split_size_val, cfg.split_size_test, cfg.nr_train_ids,
        )
        n_train, n_val = int(tr_mask.sum()), int(va_mask.sum())
        if n_train == 0 or n_val == 0:
            raise ValueError(f"empty split (train={n_train}, val={n_val})")

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
    if per_config_splits:
        # one replicated copy of the full dataset; every config gathers its
        # OWN membership from it with absolute row indices (train and val)
        train_x = put_repl(x_all)
        val_x = train_x
    else:
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

    # per-config validation batch streams (shared mode tiles one stream S
    # ways — the vmapped program's validation operands always carry the
    # config axis so per-config memberships batch under the same jit)
    if per_config_splits:
        pairs = [_batched_indices(n_val, cfg.batch_size, val_rows[s]) for s in range(S)]
        val_idx_np = np.stack([p[0] for p in pairs])
        val_m_np = np.stack([p[1] for p in pairs])
    else:
        vi, vm = _batched_indices(n_val, cfg.batch_size, np.arange(n_val, dtype=np.int32))
        val_idx_np = np.ascontiguousarray(np.broadcast_to(vi, (S,) + vi.shape))
        val_m_np = np.ascontiguousarray(np.broadcast_to(vm, (S,) + vm.shape))
    val_idx_j, val_m_j = put_cfg(val_idx_np), put_cfg(val_m_np)

    host_rngs = [np.random.default_rng(s) for s in seeds]
    epochs = effective_epochs(cfg, n_train)
    V = cfg.validation_interval

    train_hist: List[np.ndarray] = []
    val_hist: List[np.ndarray] = []
    global_step = 0
    start_epoch, start_b0 = 1, 0
    if resume_dir is not None:
        carry_tpl = (params, opt_state, rngs, best_p, best_val, patience_ctr,
                     lr_valid_ctr, lr_events, stopped, ever_improved)
        loaded, meta = _load_multi_ckpt(resume_dir, carry_tpl, seeds, lr_mults,
                                        cfg, n_train, tag=_ckpt_tag)
        (params, opt_state, rngs, best_p, best_val, patience_ctr,
         lr_valid_ctr, lr_events, stopped, ever_improved) = jax.tree_util.tree_map(
            lambda a: put_cfg(np.asarray(a)), loaded)
        start_epoch, start_b0 = meta["epoch"], meta["next_b0"]
        global_step = meta["global_step"]
        if meta["thist"].size:
            train_hist.append(meta["thist"])
        if meta["vhist"].size:
            val_hist.append(meta["vhist"])
    done = bool(max_steps is not None and global_step >= max_steps)
    n_dispatches = 0
    for _epoch in range(1, epochs + 1):
        if done:
            break
        # per-config permutation of the config's split (per-seed host
        # streams) — ALWAYS drawn, so a resumed run's streams replay the
        # epochs it skips and land on the identical state
        perms = [
            host_rngs[s].permutation(n_train).astype(np.int32)
            if cfg.train_shuffle else np.arange(n_train, dtype=np.int32)
            for s in range(S)
        ]
        if _epoch < start_epoch:
            continue
        idx_all = np.zeros((S, steps_per_epoch, cfg.batch_size), np.int32)
        mask_all = np.zeros((S, steps_per_epoch, cfg.batch_size), bool)
        for s in range(S):
            rows = perms[s] if train_rows is None else train_rows[s][perms[s]]
            idx_all[s], mask_all[s] = _batched_indices(n_train, cfg.batch_size, rows)

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

        b0 = start_b0 if _epoch == start_epoch else 0
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
            n_dispatches += 1
            if checkpoint_every is not None:
                if n_dispatches % checkpoint_every == 0:
                    _save_multi_ckpt(
                        mask_dir,
                        (params, opt_state, rngs, best_p, best_val,
                         patience_ctr, lr_valid_ctr, lr_events, stopped,
                         ever_improved),
                        train_hist, val_hist,
                        dict(epoch=_epoch, next_b0=b0, global_step=global_step,
                             seeds=seeds, lr_mults=[float(m) for m in lr_mults],
                             per_config_splits=per_config_splits,
                             model_class=cfg.model_class,
                             latent_size=cfg.latent_size, tag=_ckpt_tag,
                             batch_size=cfg.batch_size, n_train=n_train),
                    )

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
        per_cfg_masks = None
        if per_config_splits:
            N = len(arrays.info)
            per_cfg_masks = []
            for s in range(S_real):
                m = {k: np.zeros(N, bool) for k in ("train", "val")}
                m["train"][train_rows[s]] = True
                m["val"][val_rows[s]] = True
                m["test"] = per_masks[s]["test"]
                per_cfg_masks.append(m)
        result.run_dirs = _save_multi_runs(cfg, result, mask_dir,
                                           per_cfg_masks=per_cfg_masks)
    return result


def _save_multi_runs(cfg: TrainConfig, result: MultiTrainResult, mask_dir: str,
                     per_cfg_masks: Optional[List[dict]] = None) -> List[str]:
    """One ``main_train``-shaped run dir per configuration: the best-params
    checkpoint under the rolling-best filename ``latest_best`` globs for,
    plus the split masks (``indices_{split}_*.npy``) ``main_test`` / the
    analysis CLI read from the run dir — the shared set copied from
    ``mask_dir``, or each config's OWN masks when ``per_cfg_masks`` is given
    (per-config splits: a config must be tested on ITS test membership).
    The full optimizer state is not written — use ``checkpoint_every`` /
    ``resume_dir`` on ``train_ae_multi`` for mid-run resume."""
    from ae_waveforms_tpu.train import checkpoint as ckpt

    stamp = time.strftime("%y-%m-%d-%H%M%S")
    # a reused results_dir can hold date-stamped mask sets from EARLIER
    # runs; copy only the set split_datasets wrote/loaded for THIS run (the
    # newest per split — main_test loads sorted(...)[0], so a stale older
    # stamp in the run dir would silently win)
    masks = []
    for split in ("train", "val", "test"):
        cands = glob.glob(os.path.join(mask_dir, f"indices_{split}_*.npy"))
        if cands:
            masks.append(max(cands, key=os.path.getmtime))
    mults = result.lr_multipliers
    tag_lr = mults is not None and not np.allclose(mults, 1.0)
    dirs: List[str] = []
    seen: Dict[str, int] = {}
    for i, seed in enumerate(result.seeds):
        # latent tag first: grouped multi-latent runs can share a stamp and
        # a seed across groups (the -s / -lr suffix checks stay valid)
        name = f"{stamp}-d{cfg.latent_size}-s{seed}"
        if tag_lr:  # lr-sweep configs share seeds; the multiplier is the key
            name += f"-lr{float(mults[i]):g}"
        # duplicate configs in one call (--seeds 3,3) must not collapse
        # into one dir with the later checkpoint overwriting the earlier
        n_prev = seen.get(name, 0)
        seen[name] = n_prev + 1
        if n_prev:
            name += f"-i{n_prev}"
        run_dir = os.path.join(cfg.results_dir, "networks_autoencoder", name)
        os.makedirs(run_dir, exist_ok=True)
        # a config whose validation never fired (max_steps below the first
        # boundary) has best_val == inf; stamp 'final' instead — the params
        # are the final ones via _never_improved_fallback, and latest_best's
        # glob still matches
        val = ("final" if not result.ever_improved[i]
               else float(np.around(result.best_val[i], 4)))
        ckpt.save_state(
            os.path.join(run_dir, f"model_min_val_loss-{val}_params.npz"),
            result.params_for(i),
        )
        if per_cfg_masks is not None:
            date = time.strftime("%y%m%d")
            for split, m_arr in per_cfg_masks[i].items():
                np.save(os.path.join(run_dir, f"indices_{split}_{date}"), m_arr)
        else:
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
