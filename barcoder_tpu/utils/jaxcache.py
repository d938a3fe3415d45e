"""Persistent XLA/Mosaic compilation cache.

The Hamming-scan kernels compile once per (L, K, P) configuration; on the
tunneled single-chip dev setup a cold Mosaic compile of the L=32 kernel
costs ~2 minutes. Caching compiled executables on disk makes every CLI
invocation after the first start hot.

The cache (and the device-assignment key patch below) is scoped to the
TPU/axon backends only: XLA:CPU persistent entries are AOT-compiled for the
exact host CPU ("machine features") and loading them on a different machine
warns/SIGILLs — CPU runs (tests, dryrun_multichip, cpu-fallback bench) must
always compile fresh.

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

    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return
    if platform not in ("tpu", "axon"):
        _enabled = True  # decided for this process; don't re-probe
        return

    cache_dir = os.environ.get(
        "BARCODER_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "barcoder_tpu", "jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 0.15 s: BENCH r3 showed 8 sub-1s executables recompiling in every
        # fresh process (~8 s of the 9.1 s warm-cache first call); persisting
        # them too costs a few hundred KB of disk
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.15)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _strip_device_assignment_from_cache_key()
        if platform == "axon":
            _force_cache_used_for_axon()
        _enabled = True
    except Exception as e:  # pragma: no cover - cache is best-effort
        # best-effort, but NOT silent: both patches below poke jax._src
        # internals, and a jax upgrade that renames them would otherwise
        # regress cold start ~10x (9 s -> ~2 min Mosaic recompile) with no
        # signal (ADVICE r3)
        import warnings

        warnings.warn(
            "barcoder_tpu: persistent compilation cache setup failed "
            f"({e!r}); every process will pay full Mosaic recompiles "
            "(~minutes on the L=32 kernel). Check jax version vs "
            "utils/jaxcache.py's private-API patches.",
            RuntimeWarning,
        )


def _force_cache_used_for_axon() -> None:
    """jax 0.9 hard-codes the persistent cache to platforms
    ``["tpu", "gpu", "cpu", "neuron"]`` (`compilation_cache.is_cache_used`);
    the axon tunnel plugin reports platform "axon", so every process paid a
    full Mosaic recompile (BENCH_r02: first_call_s = 104 s) while the cache
    dir stayed empty. The backend IS a TPU and (when it advertises
    executable serialization) its executables round-trip fine — mark the
    cache as usable for this task. No-ops if the client explicitly reports
    ``supports_executable_serialization = False``."""
    import jax

    client = jax.devices()[0].client
    if not getattr(client, "supports_executable_serialization", True):
        return
    from jax._src import compilation_cache as _cc

    with _cc._cache_initialized_mutex:
        _cc._cache_checked = True
        _cc._cache_used = True


def _strip_device_assignment_from_cache_key() -> None:
    """Upstream JAX strips the device assignment from the persistent cache
    key only on GPU; the axon TPU tunnel embeds session-specific device info
    in the compile options, so every process computed a fresh key and paid a
    full Mosaic recompile (~minutes). Stripping it on every backend makes
    keys stable across processes. Safe on single-controller setups where
    the assignment carries no partitioning information."""
    from jax._src import cache_key as _ck

    orig = _ck._hash_serialized_compile_options
    if getattr(orig, "_barcoder_tpu_patched", False):
        return

    def patched(*args, **kw):
        # pure passthrough signature: hard-coding the private function's
        # current 3-arg shape would turn any future jax signature drift
        # into a TypeError inside jit instead of degrading gracefully —
        # only the strip_device_assignment flag (positional 3rd or kw) is
        # forced True, everything else flows through untouched
        if len(args) >= 3:
            args = args[:2] + (True,) + args[3:]
        else:
            kw["strip_device_assignment"] = True
        return orig(*args, **kw)

    patched._barcoder_tpu_patched = True
    _ck._hash_serialized_compile_options = patched
