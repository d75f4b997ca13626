"""Multi-config AE training: S configurations in one program vs S
sequential runs (VERDICT r3 item 3's done-condition).

The flagship LSTM-AE at the reference batch 128 is latency-bound — the
320-step scan's serial chain sets the step time and the MXU sits mostly
idle (BENCHMARKS.md round 3/4 MFU table) — so training S seed/lr
configurations as ONE vmapped program (train/multi.py) should cost far less
than S sequential walls.  The reference's analysis consumes two trained AEs
(analysis_performance_traditional_vs_ae.py:226-230) plus 25-seed studies,
each a separate 622 s run of main_ae.py.

Measures, at the flagship shape (LSTM-AE, latent 10, batch 128, seq 320,
synthetic beats):

  * wall of train_ae_multi with S = 1 (the sequential-equivalent unit)
  * wall of train_ae_multi with S in {4, 8}
  * max |loss delta| of each config in the S-run vs its own S=1 run
    (vmap is a batching transform — must match to f32 tolerance)

Run: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/bench_ae_multi.py
"""
from __future__ import annotations

import time

import numpy as np

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.core.schema import ArraySet
from ae_waveforms_tpu.train.multi import train_ae_multi

BATCH, SEQ, LATENT = 128, 320, 10
N_BEATS, N_CASES = 6400, 32
MAX_STEPS = 72  # bounded: 2 dispatch-heavy epochs' worth of fused segments


def _arrays() -> ArraySet:
    rng = np.random.default_rng(0)
    waves = rng.standard_normal((N_BEATS, SEQ)).astype(np.float32)
    feats = rng.standard_normal((N_BEATS, 35)).astype(np.float32)
    case = np.repeat(np.arange(1, N_CASES + 1), N_BEATS // N_CASES)
    info = np.stack([case, 10000.0 * (1 + np.arange(N_BEATS) % 5)], axis=1)
    return ArraySet(waves=waves, features=feats, info=info)


def main() -> None:
    import tempfile

    arrays = _arrays()
    tmp = tempfile.mkdtemp(prefix="ae_multi_bench_")
    cfg = TrainConfig(
        dataset_dir=tmp,
        results_dir=tmp,
        model_class="LSTMAutoencoder",
        latent_size=LATENT,
        batch_size=BATCH,
        epochs=2,
        validation_interval=20,
        split_size_val=0.2,
        split_size_test=0.2,
        lr=1e-3,
        seed=1,
        plotting=False,
    )

    def run(seeds):
        t0 = time.perf_counter()
        res = train_ae_multi(cfg, seeds=seeds, arrays=arrays, max_steps=MAX_STEPS)
        return time.perf_counter() - t0, res

    # compile + relay warm at every program shape first
    for seeds in ([11], [11, 12, 13, 14], list(range(11, 19))):
        run(seeds)

    wall1, base = run([11])
    singles = {11: base}
    print(f"S=1: {wall1:7.2f} s wall", flush=True)
    for S in (4, 8):
        seeds = list(range(11, 11 + S))
        wall, res = run(seeds)
        deltas = []
        for i, s in enumerate(seeds):
            if s not in singles:
                _, singles[s] = run([s])
            deltas.append(
                np.max(np.abs(res.train_losses[:, i] - singles[s].train_losses[:, 0]))
            )
        print(
            f"S={S}: {wall:7.2f} s wall = {wall / wall1:.2f}x the S=1 wall "
            f"({S / (wall / wall1):.1f}x effective speedup vs sequential); "
            f"max per-config |loss delta| vs its own single run: {max(deltas):.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
