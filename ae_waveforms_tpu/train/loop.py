"""AE training driver (capability twin of functions_ae/run_train.py).

TPU-first structure: the whole dataset lives in device memory; an epoch is a
host-side sequence of jit-compiled *chunks*, each a ``lax.scan`` over
``validation_interval`` train steps (batch gather + forward + backward +
optimizer update fused into one program, no per-step dispatch).  Validation
runs between chunks, exactly at the reference's cadence (after local steps
0, V, 2V, ... of each epoch, run_train.py:317-319).  Batches shard over the
mesh 'data' axis; parameters are replicated and XLA emits the gradient psum
over ICI.

Replicated behaviours: loss/optimizer/scheduler selection
(run_train.py:205-248), every-10-steps CSV logging (:305-309), validation
CSV (:327-333), StepLR stepping only on validation-plateau events
(:343-348), early stopping with best-checkpoint retention (:30-103), epoch
rescale for ``nr_train_ids`` runs via the 228,543-sample target (:472), and
final model save (:537-538).
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.core.schema import ArraySet, load_arrays
from ae_waveforms_tpu.models.registry import MODEL_REGISTRY
from ae_waveforms_tpu.parallel.mesh import data_mesh
from ae_waveforms_tpu.train import checkpoint as ckpt
from ae_waveforms_tpu.train.data import layout_waves, split_datasets
from ae_waveforms_tpu.train.logs import CsvLogs, make_tracker, setup_logging
from ae_waveforms_tpu.train.optimizers import make_optimizer
from ae_waveforms_tpu.train.schedules import (
    cosine_annealing_warm_restarts,
    cosine_annealing_warmup_hard_restarts,
)

__all__ = ["main_train"]


def _elementwise_loss(kind: str, pred, true):
    if kind == "mse" or kind == "rmse":
        return (pred - true) ** 2
    if kind == "mae":  # SmoothL1
        d = jnp.abs(pred - true)
        return jnp.where(d < 1.0, 0.5 * d**2, d - 0.5)
    raise ValueError(f"unsupported loss {kind!r}")


def _finalize_loss(kind: str, total, count):
    mean = total / count
    return jnp.sqrt(mean) if kind == "rmse" else mean


def _lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    if cfg.lr_scheduler_type == "CosineAnnealing":
        t0 = int(steps_per_epoch / cfg.lr_scheduler_caw_settings[0])
        return cosine_annealing_warm_restarts(cfg.lr, t0, eta_min=1e-4), False
    if cfg.lr_scheduler_type == "CosineAnnealingWarmup":
        resets, warm_val, eta_min = cfg.lr_scheduler_caw_settings
        t0 = int(steps_per_epoch / resets)
        warmup = int(warm_val * cfg.validation_interval)
        return cosine_annealing_warmup_hard_restarts(cfg.lr, t0, warmup, eta_min), False
    # StepLR: constant within the schedule; the plateau event scale multiplies it
    return (lambda step: jnp.asarray(cfg.lr, jnp.float32)), True


def make_train_chunk(mdef, optimizer, loss_kind: str, schedule, mesh, dropout_rate: float = 0.2):
    """Compile-once chunk runner: scans `n_steps` train steps."""
    batch_sharding = NamedSharding(mesh, P("data"))

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0, 1))
    def run_chunk(params, opt_state, rng, data_x, idx_chunk, mask_chunk, step0, lr_scale, n_steps):
        def one_step(carry, inp):
            params, opt_state, rng = carry
            idx, mask, local = inp
            rng, kstep = jax.random.split(rng)
            lr_t = schedule(step0 + local) * lr_scale

            x = jnp.take(data_x, idx, axis=0)
            x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data", None, None)))
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

        locals_ = jnp.arange(n_steps)
        (params, opt_state, rng), (losses, lrs) = jax.lax.scan(
            one_step, (params, opt_state, rng), (idx_chunk, mask_chunk, locals_)
        )
        return params, opt_state, rng, losses, lrs

    return run_chunk


def make_validator(mdef, loss_kind: str, mesh):
    @jax.jit
    def validate(params, val_x, idx, mask):
        def body(carry, inp):
            total, count = carry
            bidx, bmask = inp
            x = jnp.take(val_x, bidx, axis=0)
            x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data", None, None)))
            pred = mdef.forward(params, x, train=False)
            elem = _elementwise_loss(loss_kind, pred, x)
            w = bmask.astype(x.dtype)[:, None, None]
            total = total + jnp.sum(elem * w)
            count = count + jnp.sum(w) * elem.shape[1] * elem.shape[2]
            return (total, count), None

        (total, count), _ = jax.lax.scan(body, (jnp.zeros(()), jnp.zeros(())), (idx, mask))
        return _finalize_loss(loss_kind, total, count)

    return validate


def effective_epochs(cfg: TrainConfig, n_train: int) -> int:
    """Epoch count, rescaled when training on a case-id subsample so the
    total step budget targets ~228,543 samples (run_train.py:472 quirk —
    note the upstream formula divides the target by steps-per-epoch, i.e.
    the units are 'samples over batches', preserved as-is)."""
    if cfg.nr_train_ids > 0:
        return int(np.ceil(cfg.target_train_samples / (n_train / cfg.batch_size)))
    return cfg.epochs


def _batched_indices(n: int, batch: int, perm: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a permutation to full batches; returns (steps, B) indices + mask."""
    steps = math.ceil(n / batch)
    padded = np.zeros(steps * batch, np.int32)
    padded[:n] = perm
    mask = np.zeros(steps * batch, bool)
    mask[:n] = True
    return padded.reshape(steps, batch), mask.reshape(steps, batch)


def main_train(
    cfg: TrainConfig,
    arrays: Optional[ArraySet] = None,
    mesh=None,
    max_steps: Optional[int] = None,
    resume_dir: Optional[str] = None,
    profile_dir: Optional[str] = None,
) -> str:
    """Train an autoencoder; returns the results directory.

    ``resume_dir``: a previous run's results dir — the full train state
    (params + optimizer + PRNG + step) is restored from its best resumable
    checkpoint and training continues (a capability the reference lacks:
    its checkpoints hold model weights only, SURVEY §5.4).
    ``profile_dir``: wraps the first training chunk in a jax.profiler trace.
    """
    t_start = time.time()
    np.random.seed(cfg.seed)

    import contextlib

    precision_ctx = (
        jax.default_matmul_precision(cfg.compute_dtype)
        if cfg.compute_dtype not in ("default", None)
        else contextlib.nullcontext()
    )

    run_id = time.strftime("%y-%m-%d-%H%M%S")
    results_dir = os.path.join(cfg.results_dir, "networks_autoencoder", run_id)
    os.makedirs(results_dir, exist_ok=True)
    logger = setup_logging(results_dir)
    tags = [
        cfg.model_class, f"latent_size={cfg.latent_size}", f"batch_size={cfg.batch_size}",
        f"lr={cfg.lr}", cfg.lr_scheduler_type, f"validation_interval={cfg.validation_interval}",
        f"early_stopping_patience={cfg.early_stopping_patience}", cfg.loss, cfg.optimizer_type,
        f"dropout={cfg.dropout}", f"weight_decay={cfg.weight_decay}", f"seed={cfg.seed}",
        f"dataset_dir={cfg.dataset_dir}", f"nr_train_ids={cfg.nr_train_ids}",
    ]
    tracker = make_tracker(cfg.tracker, results_dir, tags)
    csvlog = CsvLogs(results_dir)

    if mesh is None:
        mesh = data_mesh(cfg.n_devices or None, cfg.model_parallel)
    if cfg.model_class not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model class {cfg.model_class!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    mdef = MODEL_REGISTRY[cfg.model_class]

    rng = jax.random.PRNGKey(cfg.seed)
    rng, k_init = jax.random.split(rng)
    params = mdef.init(k_init, cfg.latent_size, cfg.dropout)
    ckpt.save_state(os.path.join(results_dir, "model_init.npz"), params)

    logger.info(f"Start loading data from dataset version: {cfg.dataset_dir}")
    if arrays is None:
        arrays = load_arrays(cfg.dataset_dir)
    tr_mask, va_mask, te_mask = split_datasets(
        arrays.info, cfg.dataset_dir, results_dir, cfg.split_size_val, cfg.split_size_test, cfg.nr_train_ids
    )
    logger.info(f"Data loading done. Length of Data: {len(arrays)} samples")

    n_train = int(tr_mask.sum())
    n_val = int(va_mask.sum())
    if n_train == 0 or n_val == 0:
        raise ValueError(
            f"empty split (train={n_train}, val={int(va_mask.sum())}, test={int(te_mask.sum())}): "
            "with few case ids the seeded patient-level draw can leave a split empty — "
            "increase the dataset, adjust split fractions, or change the seed"
        )
    epochs = effective_epochs(cfg, n_train)

    x_all = layout_waves(np.asarray(arrays.waves, np.float32), mdef.channel_first)
    train_x = jax.device_put(x_all[tr_mask], NamedSharding(mesh, P()))
    val_x = jax.device_put(x_all[va_mask], NamedSharding(mesh, P()))

    optimizer = make_optimizer(
        cfg.optimizer_type,
        cfg.lr,
        cfg.weight_decay,
        momentum=cfg.sgd_momentum,
        ranger_momentum=cfg.ranger_momentum,
        ranger_threshold=cfg.ranger_threshold,
    )
    opt_state = optimizer.init(params)

    resume_step = 0
    if resume_dir is not None:
        template = {"params": params, "opt_state": opt_state, "rng": rng, "step": jnp.zeros((), jnp.int32)}
        restored = ckpt.load_state(ckpt.latest_resumable(resume_dir), template)
        params, opt_state, rng = restored["params"], restored["opt_state"], restored["rng"]
        resume_step = int(restored["step"])
        logger.info(f"Resumed full train state from {resume_dir} at step {resume_step}")

    steps_per_epoch = math.ceil(n_train / cfg.batch_size)
    schedule, is_steplr = _lr_schedule(cfg, steps_per_epoch)
    run_chunk = make_train_chunk(mdef, optimizer, cfg.loss, schedule, mesh, cfg.dropout)
    validator = make_validator(mdef, cfg.loss, mesh)
    val_idx, val_m = _batched_indices(n_val, cfg.batch_size, np.arange(n_val, dtype=np.int32))

    # early-stopping state (run_train.py:30-103)
    patience_counter, early_stop = 0, False
    valid_loss_min = np.inf
    train_loss_best = np.inf
    best_path = None
    lr_valid_counter = 0
    lr_events = 0
    global_step = resume_step

    logger.info(f"Start training with learning rate scheduler: {cfg.lr_scheduler_type}")
    V = cfg.validation_interval
    stack = contextlib.ExitStack()
    stack.enter_context(precision_ctx)
    for epoch in range(1, epochs + 1):
        t_epoch = time.time()
        tracker.log("epoch", epoch)
        # train_shuffle=False iterates in dataset order (DataLoader semantics);
        # val order never matters for the loss (reference default val_shuffle=False)
        perm = (
            np.random.permutation(n_train).astype(np.int32)
            if cfg.train_shuffle
            else np.arange(n_train, dtype=np.int32)
        )
        idx_all, mask_all = _batched_indices(n_train, cfg.batch_size, perm)

        # chunk layout replicating "validate after local step 0, V, 2V, ...":
        local = 0
        while local < steps_per_epoch and not early_stop:
            n_steps = 1 if local == 0 else min(V, steps_per_epoch - local)
            sl = slice(local, local + n_steps)
            lr_scale = jnp.asarray(0.5**lr_events if is_steplr else 1.0, jnp.float32)
            from ae_waveforms_tpu.train.profiling import trace

            first_chunk = epoch == 1 and local == 0
            with trace(profile_dir if first_chunk else None):
                params, opt_state, rng, losses, lrs = run_chunk(
                    params, opt_state, rng,
                    train_x, jnp.asarray(idx_all[sl]), jnp.asarray(mask_all[sl]),
                    jnp.asarray(global_step, jnp.int32), lr_scale, n_steps,
                )
            losses = np.asarray(losses)
            lrs = np.asarray(lrs)
            for j in range(n_steps):
                s_local = local + j
                if s_local % 10 == 0 and s_local != 0:
                    csvlog.train_step(epoch, s_local, float(lrs[j]), float(losses[j]))
                tracker.log("Train Loss", float(losses[j]))
                tracker.log("Batch number", s_local)
                tracker.log("Learning Rate", float(lrs[j]))
            global_step += n_steps
            local += n_steps
            last_local = local - 1
            train_loss_local = float(losses[-1])
            lr_current = float(lrs[-1])

            if last_local % V == 0:
                val_loss = float(validator(params, val_x, jnp.asarray(val_idx), jnp.asarray(val_m)))
                logger.info(f"[Epoch: {epoch}, step: {last_local}] / lr = {lr_current}")
                logger.info(f"\tTrain loss: {train_loss_local}, \t Validation loss: {val_loss}")
                csvlog.validation(epoch, last_local, lr_current, train_loss_local, val_loss)
                tracker.log("Validation loss", val_loss)

                # StepLR plateau events (run_train.py:343-348)
                if is_steplr and cfg.lr_scheduler_val_delay > 0:
                    if val_loss >= valid_loss_min:
                        lr_valid_counter += 1
                    if lr_valid_counter == cfg.lr_scheduler_val_delay:
                        lr_events += 1
                        lr_valid_counter = 0

                # early stopping + rolling best checkpoint
                if val_loss < valid_loss_min:
                    state = {"params": params, "opt_state": opt_state, "rng": rng,
                             "step": jnp.asarray(global_step)}
                    best_path = ckpt.save_best(results_dir, val_loss, state, params=params)
                    train_loss_best = train_loss_local
                    valid_loss_min = val_loss
                    patience_counter = 0
                else:
                    patience_counter += 1
                    logger.info(f"EarlyStopping counter: {patience_counter} out of {cfg.early_stopping_patience}")
                    if patience_counter >= cfg.early_stopping_patience:
                        early_stop = True
                        logger.warning(f"Early Stopping @ epoch : {epoch} / step : {last_local}")

            if max_steps is not None and global_step >= max_steps:
                early_stop = True

        logger.info(
            f"End training epoch number {epoch} from {epochs} / at {time.time() - t_epoch:.1f}s; "
            f"best validation loss = {valid_loss_min}"
        )
        if early_stop:
            break
    stack.close()

    # final model: best params if any, else current (run_train.py:537-538)
    if best_path is not None:
        template = {"params": params, "opt_state": opt_state, "rng": rng, "step": jnp.asarray(global_step)}
        best_state = ckpt.load_state(best_path, template)
        final_params = best_state["params"]
    else:
        final_params = params
    ckpt.save_state(os.path.join(results_dir, "model_autoencoder.npz"), final_params)
    logger.info(f"Training is finished. Best validation loss: {valid_loss_min}")
    logger.info(f"Execution finished and saved at: {results_dir} ({time.time() - t_start:.1f}s)")
    csvlog.close()
    tracker.close()
    return results_dir
