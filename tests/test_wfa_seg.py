"""Full-history segment kernel (wfa_pallas_seg) vs the wfa_np spec.

The device backtrace must produce BIT-IDENTICAL CIGARs to the host
reference (same recurrences, same tie-breaks): the kernel replaces the
host leaf solver inside the exact engine, so byte equality — not just
score equality — is the bar. Runs in interpret mode on CPU."""

import numpy as np
import pytest

from wfmash_tpu.align.wfa_np import Penalties, wfa_align
from wfmash_tpu.align.wfa_pallas_seg import SegmentSolver

from test_wfa import make_pair
from util import random_dna

PATCH = Penalties(5, 8, 2, 24, 1)
WFLIGN = Penalties(2, 3, 1, 3, 1)


def _check(jobs, p, solver=None):
    solver = solver or SegmentSolver(p, interpret=True)
    got = solver.solve(jobs)
    for (q, t), ops in zip(jobs, got):
        s_ref, ops_ref = wfa_align(q, t, p)
        assert ops is not None, (len(q), len(t))
        assert ops == ops_ref, (len(q), len(t), ops[:5], ops_ref[:5])


def test_seg_small_batch_bit_identical():
    rng = np.random.default_rng(3)
    jobs = []
    for _ in range(8):
        n = int(rng.integers(40, 340))
        jobs.append(make_pair(rng, n, sub=0.05, indel=0.02, max_indel=8))
    _check(jobs, PATCH)


def test_seg_divergent_and_wflign_penalties():
    rng = np.random.default_rng(4)
    jobs = []
    for _ in range(4):
        n = int(rng.integers(100, 400))
        jobs.append(make_pair(rng, n, sub=0.15, indel=0.03, max_indel=10))
    _check(jobs, WFLIGN)


def test_seg_edge_cases():
    rng = np.random.default_rng(5)
    s = random_dna(rng, 300)
    jobs = [
        (s, s),                       # perfect match, score 0
        (s[:200], s[:200]),
        (b"", s[:50]),                # empty query -> pure D
        (s[:50], b""),                # empty target -> pure I
        (s[:64], bytes(64)),          # all-mismatch (zeros vs DNA)
        (s[:100] + s[180:300], s),    # clean 80bp deletion
        (s, s[:100] + s[180:300]),    # clean 80bp insertion
    ]
    _check(jobs, PATCH)


def test_seg_rejects_out_of_envelope():
    rng = np.random.default_rng(6)
    solver = SegmentSolver(PATCH, interpret=True)
    long = random_dna(rng, 600)       # > lseg-1
    got = solver.solve([(long, long)])
    assert got == [None]
    q = random_dna(rng, 500)
    t = q[:250]                       # |diff| = 250 >= K - 2*margin
    assert solver.solve([(q, t)]) == [None]


def test_seg_band_centering_covers_large_skew():
    """|m-n| up to K - 2*margin - 1 is solvable now that the band is
    re-centered per problem via sequence placement (round-3)."""
    from wfmash_tpu.align.wfa_np import wfa_align

    rng = np.random.default_rng(6)
    q = random_dna(rng, 400)
    t = q[:200]                       # old envelope rejected this
    got = solver_solve_one(q, t)
    _, ref = wfa_align(q, t, PATCH)
    assert got == ref


def solver_solve_one(q, t):
    solver = SegmentSolver(PATCH, interpret=True)
    return solver.solve([(q, t)])[0]


def test_seg_score_cap_flags_failure():
    rng = np.random.default_rng(7)
    q = random_dna(rng, 400)
    t = random_dna(rng, 400)          # unrelated: score >> smax
    solver = SegmentSolver(PATCH, interpret=True, smax=64)
    assert solver.solve([(q, t)]) == [None]


def test_seg_group_padding_many():
    """17 problems -> two PB=16 groups with padding lanes."""
    rng = np.random.default_rng(8)
    jobs = []
    for _ in range(17):
        n = int(rng.integers(30, 200))
        jobs.append(make_pair(rng, n, sub=0.08, indel=0.02, max_indel=5))
    _check(jobs, PATCH)


def test_seg_fuzz_tie_breaks():
    """Two-letter alphabet sequences maximize equal-score alternatives;
    the device backtrace must still match wfa_np's documented priority
    byte-for-byte."""
    rng = np.random.default_rng(11)
    jobs = []
    for _ in range(12):
        n = int(rng.integers(20, 180))
        t = bytes(rng.choice([65, 67], size=n).astype(np.uint8))
        q = bytearray(t)
        for _ in range(int(rng.integers(0, 8))):
            pos = int(rng.integers(0, len(q)))
            r = rng.random()
            if r < 0.4:
                q[pos] = 67 if q[pos] == 65 else 65
            elif r < 0.7:
                q.insert(pos, int(rng.choice([65, 67])))
            elif len(q) > 2:
                del q[pos]
        jobs.append((bytes(q), t))
    _check(jobs, PATCH)
    _check(jobs, WFLIGN)


def test_tiered_solver_bit_identical():
    """Tier-1 (PB=64,K=128,smax=128) results and tier-2 escalations must
    both be bit-identical to wfa_np."""
    from wfmash_tpu.align.wfa_pallas_seg import TieredSegmentSolver

    rng = np.random.default_rng(19)
    jobs = []
    for _ in range(6):
        n = int(rng.integers(60, 300))
        jobs.append(make_pair(rng, n, sub=0.04, indel=0.01, max_indel=5))
    # a big-gap pair tier 1 must reject (|m-n| = 100 > K1/2) and tier 2
    # must solve
    s = random_dna(rng, 400)
    jobs.append((s, s[:150] + s[250:]))
    sol = TieredSegmentSolver(PATCH, interpret=True)
    got = sol.solve(jobs)
    for (q, t), ops in zip(jobs, got):
        _, ref = wfa_align(q, t, PATCH)
        assert ops == ref, (len(q), len(t))


# ---------------------------------------------------------------------------
# Round-3: ends-free support (boundary patches, structural gaps) and the
# deep tier — all bit-identical to the wfa_np spec.
# ---------------------------------------------------------------------------

def _check_ef(jobs, p, solver):
    got = solver.solve(jobs)
    for (q, t, ef), ops in zip(jobs, got):
        s_ref, ops_ref = wfa_align(q, t, p, ef)
        assert ops is not None, (len(q), len(t), ef, s_ref)
        assert ops == ops_ref, (len(q), len(t), ef, ops[:5], ops_ref[:5])


def test_seg_ends_free_patches_bit_identical():
    """Head/tail boundary-patch jobs (free begin / free end on both
    sequences, wflign.cpp:240-418 shapes)."""
    from wfmash_tpu.align.wfa_np import EndsFree
    from util import mutate

    rng = np.random.default_rng(10)
    solver = SegmentSolver(PATCH, interpret=True)
    jobs = []
    for i in range(6):
        n = int(rng.integers(60, 110))
        t = random_dna(rng, n)
        q = mutate(rng, t, 0.06)
        m = len(q)
        if i % 2 == 0:
            jobs.append((q, t, EndsFree(target_begin=n, query_begin=m)))
        else:
            jobs.append((q, t, EndsFree(target_end=n, query_end=m)))
    _check_ef(jobs, PATCH, solver)


def test_seg_ends_free_structural_gaps_bit_identical():
    """Skewed pieces with the longer side free at both ends (the
    segmented engine's structural-gap treatment), both orientations."""
    from wfmash_tpu.align.wfa_np import EndsFree
    from util import mutate

    rng = np.random.default_rng(11)
    solver = SegmentSolver(PATCH, interpret=True, PB=16, K=512,
                           smax=320, lseg=2048, groups=2)
    jobs = []
    q0 = random_dna(rng, 700)
    t0 = random_dna(rng, 180) + mutate(rng, q0, 0.03) + random_dna(rng, 180)
    jobs.append((q0, t0, EndsFree(target_begin=360, target_end=360)))
    t1 = random_dna(rng, 600)
    q1 = random_dna(rng, 140) + mutate(rng, t1, 0.03) + random_dna(rng, 140)
    jobs.append((q1, t1, EndsFree(query_begin=280, query_end=280)))
    _check_ef(jobs, PATCH, solver)


def test_seg_deep_tier_midsize_bit_identical():
    """~1.2 kb end-to-end problems on the K=512 tier-3 envelope."""
    from util import mutate

    rng = np.random.default_rng(12)
    solver = SegmentSolver(PATCH, interpret=True, PB=16, K=512,
                           smax=320, lseg=2048, groups=2)
    t = random_dna(rng, 1200)
    q = mutate(rng, t, 0.04)
    _check([(q, t)], PATCH, solver)


def test_tiered_cascade_on_failure():
    """A job that exceeds tier-1's score cap must cascade to a deeper
    tier inside TieredSegmentSolver and come back exact."""
    from wfmash_tpu.align.wfa_pallas_seg import TieredSegmentSolver
    from util import mutate

    rng = np.random.default_rng(13)
    solver = TieredSegmentSolver(PATCH, interpret=True)
    t = random_dna(rng, 400)
    q = mutate(rng, t, 0.18)          # score ~> 128: beyond tier 1
    got = solver.solve([(q, t)])[0]
    _, ref = wfa_align(q, t, PATCH)
    assert got == ref


def test_seg_truncated_hull_certificates():
    """Boundary-patch jobs whose seed hull exceeds the band must still
    solve when the score certifies the anchor margin — and must REJECT
    when it does not (sound truncation, round-3)."""
    from wfmash_tpu.align.wfa_np import EndsFree
    from util import mutate

    rng = np.random.default_rng(14)
    solver = SegmentSolver(PATCH, interpret=True, PB=16, K=512,
                           smax=320, lseg=2048, groups=2)
    # low-divergence big-erode head patch: hull 2300 wide, score < cert
    t0 = random_dna(rng, 1100)
    q0 = (mutate(rng, t0, 0.03) + random_dna(rng, 100))[:1200]
    ef0 = EndsFree(target_begin=1100, query_begin=1200)
    got = solver.solve([(q0, t0, ef0)])[0]
    _, ref = wfa_align(q0, t0, PATCH, ef0)
    assert got == ref
    # very divergent same-shape patch: must reject (score >= cert bound)
    t2 = random_dna(rng, 900)
    q2 = mutate(rng, t2, 0.30)
    ef2 = EndsFree(target_begin=900, query_begin=900)
    assert solver.solve([(q2, t2, ef2)])[0] is None
