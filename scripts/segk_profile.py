"""Split the segment-kernel wall into host-pack / upload / kernel / readback.

VERDICT round-4 #1: the seg kernel is the device align workhorse and its
end-to-end throughput (0.36-0.51 Gcells/s measured) was ~0.1% of the VPU
roofline. Attribution (2026-08-19, 27 ms-RTT tunnel, pre-optimization):
pack 16 ms, upload 161 ms (6.3 MB), kernel 87 ms (28 ms of it eq_bits),
readback 213 ms (8.4 MB), decode 54 ms — transfers were 70% of the wall,
which drove the 4-bit packed upload + int16 compact-runs readback +
dispatch/collect pipelining in wfa_pallas_seg.py.

Through the axon tunnel block_until_ready lies, so every stage is fenced
by a real D2H transfer (np.asarray of a scalar forces completion; the
full asarray then prices the readback itself).

Usage: python scripts/segk_profile.py [n_jobs]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wfmash_tpu.utils import jaxcache

jaxcache.enable()

import jax

from wfmash_tpu.align.wfa_np import Penalties
from wfmash_tpu.align import wfa_pallas_seg as S


def make_jobs(n):
    rng = np.random.default_rng(1)
    jobs = []
    for _ in range(n):
        L = int(rng.integers(200, 340))
        q = rng.integers(0, 4, L).astype(np.uint8)
        t = q.copy()
        snp = rng.random(L) < 0.05
        t[snp] = (t[snp] + rng.integers(1, 4, int(snp.sum()))) % 4
        dels = np.nonzero(rng.random(len(t)) < 0.01)[0]
        t = np.delete(t, dels)
        ACGT = np.frombuffer(b"ACGT", np.uint8)
        jobs.append((ACGT[q].tobytes(), ACGT[t].tobytes(), None))
    return jobs


def fence(x):
    """Force real completion through the tunnel (D2H of one element)."""
    np.asarray(jax.device_get(x.ravel()[0]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    jobs = make_jobs(n)
    p = Penalties(5, 8, 2, 24, 1)
    solver = S.SegmentSolver(p, PB=64, K=128, smax=128, lseg=512,
                             groups=max(1, n // 64))
    B = solver.groups * solver.PB
    reps = 3

    # ---- stage 1: host packing (the _dispatch_chunk prologue) -----------
    idxs = list(range(min(n, B)))
    # warm (compile)
    disp = solver._dispatch_chunk(idxs, jobs, None)
    fence(disp["out16"])

    t_pack, t_disp, t_read, t_dec = [], [], [], []
    for _ in range(reps):
        t0 = time.monotonic()
        disp = solver._dispatch_chunk(idxs, jobs, None)
        t_disp.append(time.monotonic() - t0)   # pack + async launch
        t0 = time.monotonic()
        fence(disp["out16"])                    # device completion
        t_read.append(time.monotonic() - t0)
        t0 = time.monotonic()
        results = [None] * n
        st = ["envelope"] * n
        unc = [None] * n
        solver._collect_chunk(disp, results, st, True, unc)
        t_dec.append(time.monotonic() - t0)
        n_ok = sum(s == "ok" for s in st)

    from wfmash_tpu.utils import perf
    walls = []
    for _ in range(5):
        perf.reset()
        t0 = time.monotonic()
        results = solver.solve(jobs)
        walls.append(time.monotonic() - t0)
    wall = min(walls)
    cells = perf.get("align.device_cells")
    n_ok = sum(r is not None for r in results)
    print("solve walls:", " ".join(f"{w*1e3:.0f}" for w in walls), "ms")
    print(f"jobs={n} G={solver.groups} PB={solver.PB} K={solver.K} "
          f"L={solver.lseg} n_ok={n_ok}")
    print(f"dispatch (pack+launch): {min(t_disp)*1e3:8.1f} ms")
    print(f"device+transfers      : {min(t_read)*1e3:8.1f} ms")
    print(f"collect (read+decode) : {min(t_dec)*1e3:8.1f} ms")
    print(f"solve() wall          : {wall*1e3:8.1f} ms")
    print(f"measured swept cells  : {cells/1e6:.0f} Mcells -> "
          f"{cells/wall/1e9:.2f} Gcells/s (measured, in-kernel counter)")


if __name__ == "__main__":
    main()
