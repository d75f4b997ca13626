"""Test configuration: force an 8-device virtual CPU platform (the TPU-world
answer to multi-node testing without a cluster).

The container's sitecustomize pre-imports jax and registers the axon TPU
backend with JAX_PLATFORMS=axon, so plain env vars are too late here —
``jax.config.update`` switches the platform post-import, and XLA_FLAGS is
still honoured because no backend has been initialised yet when pytest
imports this file.

NOTE (environment): the axon plugin routes compilations through a remote
relay that serialises across processes — run ONE jax process at a time, or
use tests/run_tests.sh which strips the axon variables for fully local CPU
compilation.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ae_waveforms_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()  # repeated suite runs reuse compiled programs

# Every XLA:CPU executable holds mmapped code pages; a full-suite process
# (170 tests, hundreds of compiled programs) accumulates enough maps to
# exhaust the kernel's vm.max_map_count (65530 default), at which point
# LLVM segfaults mid-compile (observed at test ~163 of 170; measured map
# counts: ~21k maps 8 minutes in and monotonically rising).  Dropping
# JAX's executable caches unmaps them (measured: 645 -> 463 maps after
# clear_caches), and the persistent compilation cache makes the
# re-compiles cheap, so: clear whenever the process crosses a safety
# threshold well under the kernel limit.
_MAPS_CLEAR_THRESHOLD = 40_000


def pytest_runtest_teardown(item, nextitem):
    try:
        with open("/proc/self/maps") as f:
            n_maps = sum(1 for _ in f)
    except OSError:  # non-Linux: nothing to guard
        return
    if n_maps > _MAPS_CLEAR_THRESHOLD:
        jax.clear_caches()
