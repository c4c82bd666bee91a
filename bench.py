"""Benchmark: batched WFA wavefront throughput on the available device.

Measures the core alignment kernel (gap-affine-2p wavefront advance with
match extension — the hot loop of the aligner, equivalent to WFA2-lib's
wavefront compute+extend) in wavefront cells/second, where one cell is one
(problem, diagonal, state) update at one score level.

Baseline: wfmash's WFA2-lib sustains roughly 1-2 Gcells/s/core on the AVX2
CPUs of doc/performance-tuning.md; the 8-core LPA benchmark machine is
taken as ~10 Gcells/s. vs_baseline reports our single-chip ratio to that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wfmash_tpu.align.wfa_jax import (
        NEG_I, _advance, _pack_words, make_blocks, ring_size,
    )
    from wfmash_tpu.align.wfa_np import Penalties

    p = Penalties(5, 8, 2, 24, 1)
    R = ring_size(p)
    B, K, L = 64, 1025, 16384
    STEPS = 256

    rng = np.random.default_rng(0)
    q = rng.integers(65, 69, (B, L), dtype=np.uint8)
    t = q.copy()
    # ~5% divergence so wavefronts stay busy
    mut = rng.random((B, L)) < 0.05
    t[mut] = rng.integers(65, 69, int(mut.sum()), dtype=np.uint8)
    q[:, -64:] = 1
    t[:, -64:] = 2
    query_w = jnp.asarray(_pack_words(q))
    target_w = jnp.asarray(_pack_words(t))
    qlen = jnp.full((B,), L - 64, jnp.int32)
    tlen = jnp.full((B,), L - 64, jnp.int32)
    off0 = np.full((B, R, 5, K), NEG_I, np.int32)
    off0[:, 0, 0, K // 2] = 0
    off0 = jnp.asarray(off0)
    anc0 = jnp.full((B, R, 5, K), -1, jnp.int32)
    open0 = jnp.full((B, R, 4, K), -1, jnp.int32)
    axis_q = jnp.zeros((B,), bool)
    mid = tlen // 2

    @jax.jit
    def run(off, anc_v, anc_h, open_a):
        query_b = make_blocks(query_w)
        target_b = make_blocks(target_w)

        def body(s, carry):
            off, anc_v, anc_h, open_a = carry
            off, anc_v, anc_h, open_a, _, _, _ = _advance(
                off, anc_v, anc_h, open_a, s, query_b, target_b, qlen, tlen,
                axis_q, mid, K, R, p,
            )
            return (off, anc_v, anc_h, open_a)

        return jax.lax.fori_loop(1, STEPS + 1, body,
                                 (off, anc_v, anc_h, open_a))

    out = run(off0, anc0, anc0, open0)
    jax.block_until_ready(out)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = run(off0, anc0, anc0, open0)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps

    cells = B * K * 5 * STEPS
    gcells_per_s = cells / dt / 1e9
    baseline = 10.0  # Gcells/s, 8-core AVX2 WFA2-lib estimate
    print(
        json.dumps(
            {
                "metric": "wfa_wavefront_throughput",
                "value": round(gcells_per_s, 4),
                "unit": "Gcells/s/chip",
                "vs_baseline": round(gcells_per_s / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
