"""Runtime environment helpers."""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_CACHE = os.path.expanduser("~/.cache/ae_waveforms_tpu/jax")


def _host_cpu_fingerprint(cpuinfo: str = "/proc/cpuinfo") -> str:
    """Short hash of this host's CPU feature flags.

    x86 /proc/cpuinfo spells the feature line "flags"; aarch64 spells it
    "Features" — matching only the former would hash every ARM host to the
    same empty input and let incompatible AOT XLA:CPU executables cross
    machines (the SIGILL hazard this key exists to prevent).  When neither
    line exists (non-Linux), fall back to the platform identity."""
    import hashlib

    flags = b""
    try:
        with open(cpuinfo, "rb") as f:
            for line in f:
                if line.startswith((b"flags", b"Features")):
                    flags = line
                    break
    except OSError:
        pass
    if not flags:
        import platform

        flags = f"{platform.machine()}|{platform.processor()}".encode()
    return hashlib.sha1(flags).hexdigest()[:8]


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache so cold CLI processes and
    benchmark runs reuse compiled programs across invocations (single-core
    hosts pay minutes per cold compile otherwise).

    The cache is partitioned per backend and per compile context (the axon
    relay compiles XLA:CPU with different target-feature flags than a local
    build; mixing the entries triggers machine-feature mismatch warnings).

    Relay-compiled XLA:CPU executables are NOT persisted at all (returns
    None): the remote builder AOT-compiles them against ITS machine's CPU
    features, which vary across relay hosts and sessions, so no local
    partition key can make a reload safe.  The dryrun pays a cold compile
    per run instead of gambling on a feature mismatch.

    Note on the "machine type ... SIGILL" load warnings (measured, round
    4): XLA:CPU injects the LLVM tuning preferences +prefer-no-scatter /
    +prefer-no-gather into every x86 compile's target-feature list, but the
    load-time host detector never reports them — so reloading an executable
    compiled ON THIS VERY HOST still logs exactly those two "not supported
    on the host machine ... SIGILL" lines (reproduced with a fresh cache,
    one local compile, one same-host reload).  Those two lines are a false
    positive of XLA's own check, not a cross-machine load; a reload naming
    any OTHER missing feature is real and dangerous, which is what the
    fingerprint partition key prevents."""
    import jax

    import hashlib

    base = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE)
    # context key: axon presence + XLA flags (both change XLA:CPU target
    # features; mixing entries triggers machine-feature mismatch warnings)
    flags = os.environ.get("XLA_FLAGS", "")
    # any of the relay vars routes compiles through the remote builder, whose
    # XLA injects different target features (e.g. +prefer-no-scatter) than a
    # local compile on this host — those entries must not share a partition
    relay = any(
        os.environ.get(v)
        for v in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE", "AXON_LOOPBACK_RELAY")
    )
    ctx = "axon" if relay else "local"
    ctx += "-" + hashlib.sha1(flags.encode()).hexdigest()[:6]
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "cpu":
        if relay:
            # see docstring: cross-machine AOT loads are never safe here
            return None
        # XLA:CPU executables are AOT-compiled against the compiling
        # machine's CPU features; loading them on a different host logs
        # "could lead to execution errors such as SIGILL" (observed when a
        # shared cache dir crossed machines).  TPU executables don't have
        # this host dependence, so only the CPU partition is fingerprinted.
        ctx += "-" + _host_cpu_fingerprint()
    cache_dir = os.path.join(base, f"{backend}-{ctx}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
