"""Backend detection for kernel-path selection.

The Pallas kernels must engage whenever the default device is a real TPU
chip. That includes indirect PJRT plugins (e.g. the 'axon' relay platform,
whose `jax.default_backend()` is "axon" while the device kind is
"TPU v5 lite"): testing `default_backend() == "tpu"` silently dropped the
Pallas hot path to the XLA fallback on such platforms.
"""

from __future__ import annotations

import jax


def is_tpu() -> bool:
    """True when the default device is a TPU chip, under any platform name
    (native `tpu` or a relay plugin exposing a TPU device kind)."""
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    return d.platform == "tpu" or "TPU" in getattr(d, "device_kind", "")


def kernel_path() -> str:
    """Human-readable name of the matcher path the kernels will take —
    surfaced by bench.py and the e2e stats (observability of the hot
    path)."""
    return "pallas" if is_tpu() else "xla"


def cpu_cache_fingerprint() -> str:
    """Stable tag for CPU-executable cache compatibility: the host's CPU
    feature set plus whether compiles go through the remote relay.

    A CPU cache entry is an AOT-compiled executable for a SPECIFIC
    machine feature set. Entries compiled via the axon relay (its compile
    service runs on different hardware) and loaded locally are what
    crashed three rounds of full-suite runs (SIGSEGV inside
    compilation_cache.get_executable_and_time — cpu_aot_loader's
    'could lead to execution errors such as SIGILL' warning made real).
    Keying the cache directory by this tag makes such loads impossible."""
    import hashlib
    import os
    import platform

    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feat = line.strip()
                    break
    except OSError:
        pass
    relay = "relay" if os.environ.get("PALLAS_AXON_POOL_IPS") else "local"
    h = hashlib.sha1(
        (platform.machine() + feat + relay).encode()).hexdigest()[:10]
    return h


def configure_compilation_cache() -> str:
    """Enable the persistent compilation cache with a BACKEND- and
    MACHINE-SPECIFIC directory. TPU and CPU runs must not share one
    cache, and CPU caches must not be shared across machine feature sets
    or compile routes (see cpu_cache_fingerprint). Returns the directory.

    KMT_DISABLE_COMPILE_CACHE=1 makes this a no-op: jax's persistent-
    cache READ (`compilation_cache.get_executable_and_time`) segfaults
    on this class of machine for some CPU executables regardless of
    entry provenance (fresh dir, fingerprinted dir, no concurrent
    writers — five full-suite crashes across rounds 3-4 share that exact
    stack). The test runner sets the flag: tests that drive cli.run
    in-process must not re-enable the cache for the whole pytest
    process."""
    import os

    if os.environ.get("KMT_DISABLE_COMPILE_CACHE"):
        return ""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if is_tpu():
        d = os.path.join(root, ".jax_cache")
    else:
        d = os.path.join(root,
                         f".jax_cache_cpu_{cpu_cache_fingerprint()}")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d
