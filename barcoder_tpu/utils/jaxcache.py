"""Persistent XLA/Mosaic compilation cache.

The Hamming-scan kernels compile once per (L, K, P) configuration; on the
tunneled single-chip dev setup a cold Mosaic compile of the L=32 kernel
costs ~2 minutes. Caching compiled executables on disk makes every CLI
invocation after the first start hot.

Set BARCODER_TPU_NO_CACHE=1 to disable, BARCODER_TPU_CACHE_DIR to relocate.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache() -> None:
    global _enabled
    if _enabled or os.environ.get("BARCODER_TPU_NO_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "BARCODER_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "barcoder_tpu", "jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:  # pragma: no cover - cache is best-effort
        pass
