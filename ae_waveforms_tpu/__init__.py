"""ae_waveforms_tpu — TPU-native ECG waveform autoencoder framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``Computational-Biology-TUe/ae_waveforms`` (reference mounted read-only at
/root/reference):

- ``signals``     vmappable ECG signal kernels (z-score, zero-phase Butterworth
                  via parallel associative-scan IIR, R-peak detection, sample QC,
                  median beat, DWT delineation, fiducial/morphology features).
- ``data``        extraction pipeline (record -> windows -> QC -> median beat ->
                  features), per-case cache, array contracts
                  np_waves (B,320) / np_features (B,35) / np_info (B,2),
                  synthetic ECG generator for offline operation and tests.
- ``models``      pure-JAX LSTM autoencoder, conv autoencoder, LSTM classifier
                  with PyTorch-compatible initialisation and numerics.
- ``train``       losses, Ranger (RAdam+Lookahead) as an optax transform, LR
                  schedules, jit/pjit data-parallel train loop, early stopping,
                  full train-state checkpointing, CSV/terminal logging.
- ``traditional`` fixed-shape batched Gaussian-kernel reconstruction from 11
                  fiducial points, sigma-map search (device-batched sweeps +
                  host Gaussian-process optimizer).
- ``classify``    Latin-hypercube hyperparameter sampling, a JAX histogram
                  GBDT (XGBoost-capability equivalent), size x seed evaluation
                  harness, PPV analysis.
- ``parallel``    mesh/sharding helpers (1-D data mesh over ICI).
"""

__version__ = "0.1.0"
