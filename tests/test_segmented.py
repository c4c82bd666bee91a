"""Anchored segmented alignment (the TPU-native wflambda) tests.

Validity bar: every stitched CIGAR must replay exactly. Quality bar:
on realistic mutated blocks the stitched score must be optimal or
within a small factor of the DP optimum (divergence from exact biWFA
is a documented ledger item)."""

import numpy as np

from wfmash_tpu.align import cigar as C
from wfmash_tpu.align import segmented as S
from wfmash_tpu.align.biwfa import HostWfaEngine
from wfmash_tpu.align.wfa_np import Penalties, dp_align, score_cigar

from test_wfa import make_pair
from util import mutate, random_dna

PATCH = Penalties(5, 8, 2, 24, 1)


def make_engine(**kw):
    return S.SegmentedEngine(PATCH, HostWfaEngine(PATCH), interpret=True,
                             **kw)


def test_anchor_chain_monotone():
    rng = np.random.default_rng(0)
    t = np.frombuffer(random_dna(rng, 5000), np.uint8)
    q = np.frombuffer(mutate(rng, t.tobytes(), 0.05), np.uint8)
    qp, tp = S.find_anchors(q, t)
    assert len(qp) > 20
    assert np.all(np.diff(qp) > 0) and np.all(np.diff(tp) > 0)
    # anchors are exact matches
    for i in range(0, len(qp), max(1, len(qp) // 10)):
        assert q[qp[i]:qp[i] + S.ANCHOR_K].tobytes() == \
            t[tp[i]:tp[i] + S.ANCHOR_K].tobytes()


def test_segmented_replay_exact_and_near_optimal():
    rng = np.random.default_rng(1)
    eng = make_engine()
    t = random_dna(rng, 6000)
    q = mutate(rng, t, 0.05)
    ops = eng.align(q, t)
    assert ops is not None
    assert C.validate(ops, q, t, 0, 0)
    got = score_cigar(ops, PATCH)
    # exact optimum from the (fast) vectorized exact WFA
    from wfmash_tpu.align.wfa_vec import wfa_align as wfa_vec_align

    opt, _ = wfa_vec_align(q, t, PATCH)
    assert got <= opt * 1.05 + 20, (got, opt)
    assert eng.stats["segments"] > 10


def test_segmented_with_structural_indel():
    """A 900bp insertion splits the anchor chain; the oversize middle
    piece must escalate to the exact engine and still stitch exactly."""
    rng = np.random.default_rng(2)
    eng = make_engine()
    t = random_dna(rng, 5000)
    ins = random_dna(rng, 900)
    q = mutate(rng, t[:2500], 0.03) + ins + mutate(rng, t[2500:], 0.03)
    ops = eng.align(q, t)
    assert ops is not None
    assert C.validate(ops, q, t, 0, 0)
    # the insertion must appear as a large I run
    assert max((n for n, op in ops if op == "I"), default=0) > 700


def test_segmented_small_blocks_delegate():
    rng = np.random.default_rng(3)
    eng = make_engine()
    q, t = make_pair(rng, 400, sub=0.05, indel=0.02, max_indel=6)
    ops = eng.align(q, t)
    from wfmash_tpu.align.wfa_vec import wfa_align as wfa_vec_align

    s_opt, _ = wfa_vec_align(q, t, PATCH)
    assert score_cigar(ops, PATCH) == s_opt
    assert eng.stats["exact_blocks"] == 1
    assert eng.stats["segments"] == 0


def test_segmented_unanchorable_falls_back():
    rng = np.random.default_rng(4)
    eng = make_engine()
    q = random_dna(rng, 1500)
    t = random_dna(rng, 1500)   # unrelated -> no anchor chain of cuts
    ops = eng.align(q, t)
    assert ops is not None
    assert C.validate(ops, q, t, 0, 0)
    from wfmash_tpu.align.wfa_vec import wfa_align as wfa_vec_align

    assert score_cigar(ops, PATCH) == wfa_vec_align(q, t, PATCH)[0]


def test_segmented_batch_mixed():
    rng = np.random.default_rng(5)
    eng = make_engine()
    jobs = []
    for i in range(4):
        t = random_dna(rng, 3000 + 500 * i)
        q = mutate(rng, t, 0.04)
        jobs.append((q, t, None))
    res = eng.align_batch(jobs)
    for (q, t, _), ops in zip(jobs, res):
        assert ops is not None
        assert C.validate(ops, q, t, 0, 0)
