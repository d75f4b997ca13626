"""Reference-scale Ranger soak on the real chip (VERDICT r1 item 10).

250,000 synthetic beats, the reference's exact LSTM-AE training defaults
(d=10, batch 128, 10 epochs, validate every 200, patient-level splits)
with ``--optimizer_type ranger``.  The reference CRASHES on this path —
its Ranger wiring passes the param groups positionally into a keyword-only
slot (ranger_optimizer.py via run_train.py:223) — so the bar is running at
scale, not matching a trajectory; the optax Ranger's trajectory parity is
covered by tests/test_train.py.

Run from the repo root on the chip:  python benchmarks/soak_ranger.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

N_PATIENTS = 500
BEATS_PER_PATIENT = 500
BEAT_LEN = 320


def synth_beats(n_patients: int, per_patient: int, seed: int = 0):
    """Gaussian-bump median beats (P, QRS, T) with per-patient morphology and
    per-beat noise — enough structure for the loss to fall, cheap to draw."""
    rng = np.random.default_rng(seed)
    t = np.arange(BEAT_LEN, dtype=np.float32)
    waves = np.empty((n_patients * per_patient, BEAT_LEN), np.float32)
    info = np.empty((n_patients * per_patient, 2), np.float32)
    for p in range(n_patients):
        centers = np.array([100, 160, 230]) + rng.normal(0, 4, 3)
        widths = np.array([8.0, 3.0, 14.0]) * rng.uniform(0.8, 1.2, 3)
        amps = np.array([0.15, 1.0, 0.3]) * rng.uniform(0.8, 1.2, 3)
        base = sum(
            a * np.exp(-0.5 * ((t - c) / w) ** 2) for a, c, w in zip(amps, centers, widths)
        ).astype(np.float32)
        lo = p * per_patient
        waves[lo : lo + per_patient] = base + rng.normal(0, 0.03, (per_patient, BEAT_LEN))
        info[lo : lo + per_patient, 0] = p
        info[lo : lo + per_patient, 1] = np.arange(per_patient)
    return waves, info


def main():
    from ae_waveforms_tpu.core.config import TrainConfig
    from ae_waveforms_tpu.core.schema import ArraySet
    from ae_waveforms_tpu.train.loop import main_train

    t0 = time.time()
    waves, info = synth_beats(N_PATIENTS, BEATS_PER_PATIENT)
    features = np.zeros((len(waves), 35), np.float32)
    arrays = ArraySet(waves=waves, features=features, info=info)
    print(f"dataset: {len(waves)} beats, {N_PATIENTS} patients "
          f"({time.time() - t0:.1f}s to draw)", flush=True)

    cfg = TrainConfig(
        dataset_dir="/tmp/soak_ranger_data",
        results_dir="/tmp/soak_ranger",
        model_class="LSTMAutoencoder",
        latent_size=10,
        optimizer_type="ranger",
        plotting=False,
    )
    t1 = time.time()
    run_dir = main_train(cfg, arrays=arrays)
    print(f"SOAK_RANGER_OK run_dir={run_dir} wall_s={time.time() - t1:.1f}", flush=True)


if __name__ == "__main__":
    main()
