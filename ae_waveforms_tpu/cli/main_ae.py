"""Autoencoder train/test CLI (capability twin of main_ae.py:10-147).

Same flag surface and defaults; importable as a library
(``autoencoder(custom_args)``) exactly like the reference, which the
trad-vs-AE analysis invokes programmatically.  Seeding covers numpy's
legacy stream (splits) and the JAX PRNG (init/dropout/shuffle) — the
deterministic-backend switches the reference needs for cuDNN are moot on
XLA, where compiled programs are deterministic by construction.
"""

from __future__ import annotations

import argparse
from typing import List, Optional

import numpy as np

from ae_waveforms_tpu.core.config import TrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Settings for training or testing autoencoder models.")
    d = TrainConfig()
    p.add_argument("-m", "--mode", dest="mode", type=str, default=d.mode, help="train, or test (inference) mode")
    p.add_argument("--dataset_dir", type=str, default=d.dataset_dir)
    p.add_argument("--results_dir", type=str, default=d.results_dir)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--model_class", type=str, default=d.model_class)
    p.add_argument("--latent_size", type=int, default=d.latent_size)
    p.add_argument("--split_size_val", type=float, default=d.split_size_val)
    p.add_argument("--split_size_test", type=float, default=d.split_size_test)
    p.add_argument("--nr_train_ids", type=int, default=d.nr_train_ids)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--validation_interval", type=int, default=d.validation_interval)
    p.add_argument("--early_stopping_patience", type=int, default=d.early_stopping_patience)
    p.add_argument("--loss", type=str, default=d.loss)
    p.add_argument("--weight_decay", type=float, default=d.weight_decay)
    p.add_argument("--dropout", type=float, default=d.dropout)
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--lr_scheduler_type", type=str, default=d.lr_scheduler_type)
    p.add_argument("--lr_scheduler_val_delay", type=int, default=d.lr_scheduler_val_delay)
    p.add_argument("--lr_scheduler_caw_settings", type=float, nargs=3, default=list(d.lr_scheduler_caw_settings))
    p.add_argument("--optimizer_type", type=str, default=d.optimizer_type)
    p.add_argument("--sgd_momentum", type=float, default=d.sgd_momentum)
    p.add_argument("--ranger_momentum", type=float, default=d.ranger_momentum)
    p.add_argument("--ranger_threshold", type=int, default=d.ranger_threshold)
    p.add_argument("--train_shuffle", type=bool, default=d.train_shuffle)
    p.add_argument("--val_shuffle", type=bool, default=d.val_shuffle)
    p.add_argument("--trained_model", type=str, default=d.trained_model)
    p.add_argument("--plotting", type=bool, default=d.plotting)
    p.add_argument("--tracker", type=str, default=d.tracker or "none")
    # device-mesh shape (TPU-native; replaces the reference's dead DDP flags)
    p.add_argument("--n_devices", type=int, default=d.n_devices,
                   help="devices in the training mesh (0 = all visible)")
    p.add_argument("--model_parallel", type=int, default=d.model_parallel,
                   help="size of the 'model' axis of the (data, model) mesh")
    # multi-config training (beyond the reference, which trains one model
    # per process): S seeds of this architecture in ONE vmapped program
    p.add_argument("--seeds", type=str, default="",
                   help="comma-separated seeds; train mode only: train all "
                        "of them simultaneously in one device program "
                        "(train/multi.py), one run dir per seed")
    p.add_argument("--lr_sweep", type=str, default="",
                   help="comma-separated learning-rate multipliers; train "
                        "mode only: crossed with --seeds (or --seed) into "
                        "one vmapped multi-config program, one run dir per "
                        "(seed, multiplier) pair")
    p.add_argument("--latent_sizes", type=str, default="",
                   help="comma-separated latent sizes; train mode only: "
                        "crossed with --seeds/--lr_sweep, one vmapped "
                        "program per latent size (the analysis pair "
                        "d=10 + d=20 in one command)")
    p.add_argument("--per_config_splits", type=bool, default=False,
                   help="multi-config runs: redraw the patient split under "
                        "each config's seed (what sequential seed studies "
                        "do, main_ae.py:128-133) instead of sharing one "
                        "cfg.seed split")
    p.add_argument("--multi_checkpoint_every", type=int, default=0,
                   help="multi-config runs: write the full stacked train "
                        "state to results_dir/multi_checkpoint.npz every K "
                        "dispatches (0 = off)")
    p.add_argument("--multi_resume_dir", type=str, default="",
                   help="multi-config runs: resume bit-compatibly from a "
                        "multi_checkpoint.npz written by a previous "
                        "--multi_checkpoint_every run")
    return p


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    return TrainConfig(
        mode=args.mode,
        dataset_dir=args.dataset_dir,
        results_dir=args.results_dir,
        seed=args.seed,
        model_class=args.model_class,
        latent_size=args.latent_size,
        split_size_val=args.split_size_val,
        split_size_test=args.split_size_test,
        nr_train_ids=args.nr_train_ids,
        batch_size=args.batch_size,
        epochs=args.epochs,
        validation_interval=args.validation_interval,
        early_stopping_patience=args.early_stopping_patience,
        loss=args.loss,
        weight_decay=args.weight_decay,
        dropout=args.dropout,
        lr=args.lr,
        lr_scheduler_type=args.lr_scheduler_type,
        lr_scheduler_val_delay=args.lr_scheduler_val_delay,
        lr_scheduler_caw_settings=tuple(args.lr_scheduler_caw_settings),
        optimizer_type=args.optimizer_type,
        sgd_momentum=args.sgd_momentum,
        ranger_momentum=args.ranger_momentum,
        ranger_threshold=args.ranger_threshold,
        train_shuffle=args.train_shuffle,
        val_shuffle=args.val_shuffle,
        trained_model=args.trained_model,
        plotting=args.plotting,
        tracker=None if args.tracker in ("none", "") else args.tracker,
        n_devices=args.n_devices,
        model_parallel=args.model_parallel,
    )


def autoencoder(custom_args: Optional[List[str]] = None):
    from ae_waveforms_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(custom_args)
    cfg = config_from_args(args)
    np.random.seed(cfg.seed)

    mode = str(cfg.mode).lower()
    if mode == "train":
        if args.seeds.strip() or args.lr_sweep.strip() or args.latent_sizes.strip():
            from ae_waveforms_tpu.train.multi import (
                train_ae_multi,
                train_ae_multi_grouped,
            )

            seeds = ([int(s) for s in args.seeds.split(",") if s.strip()]
                     if args.seeds.strip() else [cfg.seed])
            mults = ([float(m) for m in args.lr_sweep.split(",") if m.strip()]
                     if args.lr_sweep.strip() else [1.0])
            multi_kw = dict(per_config_splits=bool(args.per_config_splits))
            if args.multi_checkpoint_every:
                multi_kw.update(checkpoint_every=args.multi_checkpoint_every,
                                results_dir=cfg.results_dir)
            if args.multi_resume_dir.strip():
                multi_kw.update(resume_dir=args.multi_resume_dir.strip())
            if args.latent_sizes.strip():
                latents = [int(d_) for d_ in args.latent_sizes.split(",") if d_.strip()]
                # full (latent x seed x multiplier) cross, one vmapped
                # program per latent size (shapes differ across sizes)
                by_latent = train_ae_multi_grouped(
                    cfg,
                    [(d_, s, m) for d_ in latents for s in seeds for m in mults],
                    save_runs=True, **multi_kw,
                )
                run_dirs = []
                for d_ in latents:
                    res = by_latent[d_]
                    for s, m, rd, v in zip(res.seeds, res.lr_multipliers,
                                           res.run_dirs, res.best_val):
                        print(f"Training done (latent {d_}, seed {s}, "
                              f"lr x{m:g}, best val {v:.6f}), saved at: {rd}")
                    run_dirs.extend(res.run_dirs)
                return run_dirs
            # full cross: every seed at every lr multiplier, one program
            cross_seeds = [s for s in seeds for _ in mults]
            cross_mults = [m for _ in seeds for m in mults]
            res = train_ae_multi(cfg, cross_seeds, lr_multipliers=cross_mults,
                                 save_runs=True, **multi_kw)
            for s, m, d_, v in zip(res.seeds, res.lr_multipliers,
                                   res.run_dirs, res.best_val):
                print(f"Training done (seed {s}, lr x{m:g}, "
                      f"best val {v:.6f}), saved at: {d_}")
            return res.run_dirs
        from ae_waveforms_tpu.train.loop import main_train

        output_dir = main_train(cfg)
        print(f"Training done, results and trained model saved at: {output_dir}")
        return output_dir
    if mode in ("test", "inference"):
        from ae_waveforms_tpu.train.eval import main_test

        (_, (test_loss, rmse, rmse_samples, prd, prd_samples), (test_pred, test_true, test_c), _) = main_test(cfg)
        return test_loss, rmse, rmse_samples, prd, prd_samples, test_pred, test_true, test_c
    raise ValueError(f"unknown mode {cfg.mode!r}")


if __name__ == "__main__":
    autoencoder()
