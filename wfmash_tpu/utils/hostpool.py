"""Shared fork pool for host-side WFA work.

Forking a JAX-initialized process is expensive (large page tables, the
axon client's state), so per-call Pool() setup/teardown was costing
~10-20 s per align batch. One pool is created lazily per process and
reused; workers only ever run pure-numpy functions (host WFA, CIGAR
post-processing) — never device code.
"""

from __future__ import annotations

import atexit

_pool = None
_size = 0


def get_pool(threads: int):
    """Return a shared fork pool with `threads` workers (or None when
    threads <= 1 or pools are unavailable)."""
    global _pool, _size
    if threads <= 1:
        return None
    if _pool is not None and _size == threads:
        return _pool
    close_pool()
    try:
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        _pool = ctx.Pool(processes=threads)
        _size = threads
        atexit.register(close_pool)
    except Exception:   # pragma: no cover - platform-specific
        _pool = None
        _size = 0
    return _pool


def close_pool() -> None:
    global _pool, _size
    if _pool is not None:
        try:
            _pool.terminate()
            _pool.join()
        except Exception:   # pragma: no cover
            pass
        _pool = None
        _size = 0
