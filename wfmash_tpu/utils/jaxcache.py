"""Persistent JAX compilation cache setup.

The WFA kernels compile per (shape-ladder, penalty) combination; on a
fresh process those compiles dominate small-run wall time (30-120 s
each on TPU). Enabling JAX's persistent compilation cache makes repeat
runs start hot. Opt out with WFMASH_TPU_NO_JAX_CACHE=1 or point the
directory elsewhere with WFMASH_TPU_JAX_CACHE_DIR.
"""

from __future__ import annotations

import os

_done = False


def enable() -> None:
    global _done
    if _done or os.environ.get("WFMASH_TPU_NO_JAX_CACHE"):
        return
    _done = True
    cache_dir = os.environ.get(
        "WFMASH_TPU_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "wfmash_tpu_jax"))
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
