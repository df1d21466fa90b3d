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


def configure_compilation_cache() -> str:
    """Enable the persistent compilation cache with a BACKEND-SPECIFIC
    directory. TPU and CPU runs must not share one cache: CPU AOT blobs
    compiled on the relay host carry machine features the local CPU lacks
    (cpu_aot_loader warns about possible SIGILL), and a concurrent
    TPU bench once corrupted an entry mid-write for a CPU reader.
    Returns the chosen directory."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    d = os.path.join(root, ".jax_cache" if is_tpu() else ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d
