"""Benchmark: batched exact WFA sweep throughput on the real device.

Runs the shipped Pallas wavefront engine (wfmash_tpu.align.wfa_pallas —
the compute path of the aligner, equivalent to WFA2-lib's wavefront
compute+extend loop) end-to-end on a standard workload: 64 alignment
problems of ~16 kb at 5% divergence, exact 2-piece-affine penalties
(5,8,2,24,1), diagonal span 1024. Cells = (problem, diagonal, state)
updates per score step, counted over the scores actually swept.

Baseline: wfmash's WFA2-lib sustains roughly 1-2 Gcells/s/core on the
AVX2 CPUs of doc/performance-tuning.md; the 8-core LPA benchmark machine
is taken as ~10 Gcells/s. vs_baseline is our single-chip ratio to that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main() -> None:
    from wfmash_tpu.align.wfa_np import Penalties
    from wfmash_tpu.align.wfa_pallas import NEG_I, UNSET32, PallasSweeps

    p = Penalties(5, 8, 2, 24, 1)
    B, K, L = 64, 512, 16384  # the engine ladder picks K=512 here
    rng = np.random.default_rng(0)
    q = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, (B, L))]
    t = q.copy()
    mut = rng.random((B, L)) < 0.05
    t[mut] = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, int(mut.sum()))]
    m = L - 64
    query = np.full((B, L), 0x01, np.uint8)
    query[:, :m] = q[:, :m]
    target = np.full((B, L), 0x02, np.uint8)
    target[:, :m] = t[:, :m]
    qlen = np.full(B, m, np.int32)
    tlen = np.full(B, m, np.int32)
    axis_q = np.zeros(B, bool)
    mid = tlen // 2
    seed_off = np.full((B, K), NEG_I, np.int32)
    seed_off[:, K // 2] = 0
    seed_anc = np.full((B, K), UNSET32, np.uint32)
    done0 = np.zeros(B, bool)

    eng = PallasSweeps(p, interpret=False)

    def run():
        return eng.sweep(query, target, qlen, tlen, axis_q, mid,
                         seed_off, seed_anc, done0, max_s=200000, K=K)

    f_score, _, _, fin, _clip = run()  # compile + warm
    assert fin.all()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        f_score, _, _, fin, _ = run()
        best = min(best, time.time() - t0)

    cells = int(f_score.astype(np.int64).sum()) * K * 5
    gcells = cells / best / 1e9
    baseline = 10.0  # Gcells/s, 8-core AVX2 WFA2-lib estimate
    print(json.dumps({
        "metric": "wfa_sweep_throughput",
        "value": round(gcells, 4),
        "unit": "Gcells/s/chip",
        "vs_baseline": round(gcells / baseline, 4),
    }))


if __name__ == "__main__":
    main()
