"""Extraction CLI (capability twin of data_extract_vitaldb.py __main__ plus
data_create_arrays.py).

``python -m ae_waveforms_tpu.cli.extract --out DIR [--cases N | --case-ids ...]``

Online mode uses the VitalDB client when installed; offline mode generates
synthetic records.  Per-case caches make the run idempotent and resumable;
the final step stacks all cases into np_waves/np_features/np_info plus a
data_stats.json (case ids + per-case sample counts, the reference's
data_stats.pkl contract in a dependency-free format).
"""

from __future__ import annotations

import argparse
import json
import os
import time

from ae_waveforms_tpu.core.config import ExtractionConfig
from ae_waveforms_tpu.core.schema import save_arrays
from ae_waveforms_tpu.data.arrays import build_arrays
from ae_waveforms_tpu.data.extract import extract_cases
from ae_waveforms_tpu.data.vitaldb_io import find_cases, have_vitaldb, make_loader


def main(argv=None):
    from ae_waveforms_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True, help="output dataset dir")
    p.add_argument("--cases", type=int, default=16, help="number of cases (offline mode)")
    p.add_argument("--case-ids", type=int, nargs="*", default=None)
    p.add_argument("--duration", type=float, default=120.0, help="synthetic record seconds")
    p.add_argument("--precision", type=str, default="float64", choices=["float32", "float64"])
    p.add_argument("--engine", type=str, default="host", choices=["host", "python", "device"],
                   help="delineation engine: host f64 (native C++ first), python f64 "
                        "(pure-python reference-equivalent), or batched device f32")
    p.add_argument("--resample", type=str, default="linear",
                   choices=["linear", "fft", "poly"],
                   help="delineation analysis-rate resampler (python engine "
                        "only for non-linear; signals/delineate.py RESAMPLE_METHODS)")
    p.add_argument("--no-cache", action="store_true")
    p.add_argument("--batched", action="store_true",
                   help="pool windows across cases into large device batches")
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard each window chunk over this many chips "
                        "(device engine + --batched; SPMD over the 'data' "
                        "mesh axis, parallel/mesh.py)")
    p.add_argument("--from-parquet", type=str, default=None,
                   help="skip extraction: build the arrays from a directory of "
                        "reference-format per-case parquet files")
    args = p.parse_args(argv)

    cfg = ExtractionConfig(path_data=args.out, precision=args.precision,
                           delineation_engine=args.engine,
                           delineation_resample=args.resample)
    os.makedirs(args.out, exist_ok=True)

    if args.from_parquet:
        from ae_waveforms_tpu.data.parquet_compat import arrays_from_reference_cache

        arrays = arrays_from_reference_cache(args.from_parquet)
        save_arrays(arrays, args.out, allow_pickle=cfg.use_pickle)
        print(f"converted {len(arrays)} samples from reference parquet cache "
              f"{args.from_parquet} -> {args.out}")
        return
    cache_dir = None if args.no_cache else os.path.join(args.out, "case_ids")

    if args.case_ids is not None:
        case_ids = args.case_ids
    elif have_vitaldb():
        case_ids = find_cases(cfg.track_names)
    else:
        case_ids = list(range(1, args.cases + 1))

    loader = make_loader(cfg.track_names, cfg.sampling_frequency)
    if not have_vitaldb():
        from ae_waveforms_tpu.data.synthetic import synthetic_ecg_record

        loader = lambda cid: synthetic_ecg_record(duration_s=args.duration, seed=int(cid))  # noqa: E731

    mesh = None
    if args.n_devices is not None and args.n_devices > 1:
        if args.engine != "device" or not args.batched:
            raise SystemExit("--n_devices requires --engine device --batched")
        from ae_waveforms_tpu.parallel.mesh import data_mesh

        mesh = data_mesh(args.n_devices)

    t0 = time.time()
    results = extract_cases(case_ids, loader, cfg, cache_dir=cache_dir, progress=True,
                            batched=args.batched, mesh=mesh)
    arrays = build_arrays(results)
    save_arrays(arrays, args.out, allow_pickle=cfg.use_pickle)

    stats = {
        "case_ids": [r.case_id for r in results if len(r.waves)],
        "samples_per_case_id": [len(r.waves) for r in results if len(r.waves)],
        "samples_total": int(sum(len(r.waves) for r in results)),
        "elapsed_s": time.time() - t0,
    }
    with open(os.path.join(args.out, "data_stats.json"), "w") as f:
        json.dump(stats, f)
    print(f"extracted {stats['samples_total']} samples from {len(stats['case_ids'])} cases "
          f"in {stats['elapsed_s']:.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
