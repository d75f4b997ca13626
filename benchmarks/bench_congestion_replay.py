"""Congestion replay: does the adaptive in-flight controller keep the
streaming extraction pipeline's throughput through recorded-style tunnel
congestion?

The tunnel's documented worst behaviour (BASELINE.md) is per-dispatch
LATENCY inflation: identical programs measured 50-92 w/s inside one
congestion window vs 320-411 w/s minutes later (~8x).  This bench replays
that as a dispatch->result latency trace via
``extract._RESOLVE_LATENCY_HOOK``: every chunk's result becomes available
``L(seq)`` seconds after its dispatch, where L alternates calm stretches
with congestion windows whose latency is ``--spike_x`` times the calm
per-chunk wall (the measured 8x default).  Chunks dispatched while a
straggler is outstanding still complete on time — exactly the situation
where deeper pipelining wins and a fixed shallow queue stalls.

Run on the virtual CPU platform (deterministic, no real relay noise
confounding the replay):

    env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
        -u AXON_LOOPBACK_RELAY JAX_PLATFORMS=cpu \
        python benchmarks/bench_congestion_replay.py

Reports windows/s for the fixed depth-2 queue vs the adaptive controller
(floor 2, cap 8) under the same trace, plus the no-congestion baseline.
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from ae_waveforms_tpu.core.config import ExtractionConfig  # noqa: E402
from ae_waveforms_tpu.data import extract as ex  # noqa: E402
from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--n_cases", type=int, default=96)
p.add_argument("--windows_per_batch", type=int, default=64)
p.add_argument("--spike_x", type=float, default=8.0,
               help="congestion latency as a multiple of calm chunk wall")
p.add_argument("--congestion_period", type=int, default=12,
               help="every PERIOD chunks, a congestion window starts")
p.add_argument("--congestion_len", type=int, default=4,
               help="chunks per congestion window")
args = p.parse_args()

cfg = ExtractionConfig(delineation_engine="device")
records = {c: synthetic_ecg_record(duration_s=220.0, seed=c)
           for c in range(args.n_cases)}


def run(depth_floor, depth_cap, hook):
    ex._RESOLVE_LATENCY_HOOK = hook
    try:
        t0 = time.perf_counter()
        res = ex.extract_cases_batched(
            list(records), lambda c: records[c], cfg, cache_dir=None,
            windows_per_batch=args.windows_per_batch,
            inflight_depth=depth_floor, max_inflight_depth=depth_cap,
        )
        wall = time.perf_counter() - t0
    finally:
        ex._RESOLVE_LATENCY_HOOK = None
    n_raw = sum(r.n_windows_raw for r in res)
    return n_raw / wall, wall, n_raw


# calm baseline: measures the per-chunk wall the trace scales from
rate0, wall0, n_raw = run(2, 2, None)
n_chunks = max(n_raw // args.windows_per_batch, 1)
chunk_wall = wall0 / n_chunks
print(f"calm baseline: {rate0:.1f} w/s ({n_raw} windows, {n_chunks} chunks, "
      f"{chunk_wall*1e3:.0f} ms/chunk)", flush=True)


def trace(seq: int) -> float:
    """Recorded-style trace: periodic congestion windows at spike_x."""
    in_window = (seq % args.congestion_period) < args.congestion_len
    return args.spike_x * chunk_wall if in_window else 0.0


rate_fixed, wall_fixed, _ = run(2, 2, trace)  # cap == floor: no adaptation
rate_adapt, wall_adapt, _ = run(2, 8, trace)
print(f"congested, fixed depth 2:    {rate_fixed:.1f} w/s ({wall_fixed:.1f}s)")
print(f"congested, adaptive 2->8:    {rate_adapt:.1f} w/s ({wall_adapt:.1f}s)")
print(f"CONGESTION_REPLAY adaptive_vs_fixed={rate_adapt / rate_fixed:.2f}x "
      f"retained_vs_calm={rate_adapt / rate0:.2f}", flush=True)
