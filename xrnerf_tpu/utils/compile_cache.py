"""Persistent XLA compilation cache.

The reference's CUDA kernels are precompiled; our XLA programs are
compiled per-process, and on a relay-attached TPU a large NGP train step
can take ~15 min to compile the first time. Enabling JAX's persistent
compilation cache makes that a once-per-machine cost: every later
process (bench runs, quality tools, the driver's compile checks) reloads
the executable in seconds.

Enabled automatically at ``import xrnerf_tpu`` unless
``XRNERF_TPU_NO_CACHE=1``. The cache directory defaults to
``<repo>/.jax_cache`` and can be overridden with ``XRNERF_TPU_CACHE_DIR``.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the JAX persistent compilation cache.

    Returns the cache dir, or None if disabled/failed (never raises:
    a broken cache must not take down training).
    """
    global _ENABLED
    if os.environ.get("XRNERF_TPU_NO_CACHE"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("XRNERF_TPU_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    if _ENABLED:
        return cache_dir
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took >1s to compile; tiny programs stay
        # out so test suites don't churn thousands of small files
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _ENABLED = True
        return cache_dir
    except Exception:  # pragma: no cover - config names vary across jax versions
        return None
