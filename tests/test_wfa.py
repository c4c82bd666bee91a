"""WFA correctness: score-optimality vs an O(nm) DP oracle, CIGAR validity,
and self-consistency of the CIGAR cost with the reported score."""

import numpy as np
import pytest

from wfmash_tpu.align import cigar as C
from wfmash_tpu.align.wfa_np import EndsFree, Penalties, dp_align, score_cigar, wfa_align

from util import mutate, random_dna

# wfmash's patching penalties (parse_args.hpp:289-295)
PATCH = Penalties(5, 8, 2, 24, 1)
# wflign base penalties (treated as 2-piece with a huge second piece)
SIMPLE = Penalties(2, 3, 1, 1000, 1000)


def make_pair(rng, n, sub=0.05, indel=0.02, max_indel=20):
    """Target + mutated query with substitutions and indels."""
    target = bytearray(random_dna(rng, n))
    query = bytearray()
    i = 0
    while i < len(target):
        r = rng.random()
        if r < indel / 2:  # insertion in query
            ln = rng.integers(1, max_indel)
            query.extend(random_dna(rng, int(ln)))
        elif r < indel:  # deletion
            ln = int(rng.integers(1, max_indel))
            i += ln
            continue
        if i < len(target):
            if rng.random() < sub:
                query.append(rng.choice([b for b in b"ACGT" if b != target[i]]))
            else:
                query.append(target[i])
        i += 1
    return bytes(query), bytes(target)


def check_alignment(query, target, p, ends_free=None):
    score, ops = wfa_align(query, target, p, ends_free)
    oracle = dp_align(query, target, p, ends_free)
    assert score == oracle, f"WFA score {score} != DP oracle {oracle}"
    assert C.validate(ops, query, target, 0, 0), "invalid CIGAR"
    # CIGAR must consume both sequences fully
    _, _, _, ins_bp, _, del_bp, ref_len, q_len = C.stats(ops)
    assert q_len == len(query)
    assert ref_len == len(target)
    if ends_free is None:
        assert score_cigar(ops, p) == score
    return score, ops


@pytest.mark.parametrize("seed", range(8))
def test_end2end_random_pairs(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 300))
    query, target = make_pair(rng, n)
    check_alignment(query, target, PATCH)


@pytest.mark.parametrize("seed", range(4))
def test_end2end_simple_penalties(seed):
    rng = np.random.default_rng(100 + seed)
    query, target = make_pair(rng, 150, sub=0.1, indel=0.05)
    check_alignment(query, target, SIMPLE)


def test_identical_sequences():
    rng = np.random.default_rng(7)
    s = random_dna(rng, 200)
    score, ops = wfa_align(s, s, PATCH)
    assert score == 0
    assert ops == [(200, "=")]


def test_single_mismatch():
    q = b"ACGTACGTAC"
    t = bytearray(q)
    t[5] = ord("C") if t[5] != ord("C") else ord("G")
    score, ops = wfa_align(q, bytes(t), PATCH)
    assert score == PATCH.mismatch
    assert ops == [(5, "="), (1, "X"), (4, "=")]


def test_long_gap_uses_second_piece():
    rng = np.random.default_rng(11)
    a = random_dna(rng, 100)
    b = random_dna(rng, 60)
    query = a + b
    target = a[:100] + b  # same
    query2 = a + random_dna(rng, 50) + b  # 50bp insertion
    score, ops = check_alignment(query2, a + b, PATCH)
    # 50bp gap: piece1 = 8+100=108, piece2 = 24+50=74 -> second piece wins
    assert score <= 74 + 3 * PATCH.mismatch


@pytest.mark.parametrize("seed", range(4))
def test_ends_free_begin(seed):
    rng = np.random.default_rng(200 + seed)
    core = random_dna(rng, 120)
    # query = junk + core ; target = core, free begins on both sides
    junk = random_dna(rng, 30)
    query = junk + core
    target = core
    ef = EndsFree(target_begin=len(target), query_begin=len(query))
    score, ops = check_alignment(query, target, PATCH, ef)
    # optimal: free 30bp query-begin gap, then core matches
    assert score == 0
    assert ops[0] == (30, "I")


@pytest.mark.parametrize("seed", range(4))
def test_ends_free_end(seed):
    rng = np.random.default_rng(300 + seed)
    core = random_dna(rng, 120)
    junk = random_dna(rng, 25)
    query = core + junk
    target = core
    ef = EndsFree(target_end=len(target), query_end=len(query))
    score, ops = check_alignment(query, target, PATCH, ef)
    assert score == 0
    assert ops[-1] == (25, "I")


@pytest.mark.parametrize("seed", range(3))
def test_ends_free_random(seed):
    rng = np.random.default_rng(400 + seed)
    query, target = make_pair(rng, 80, sub=0.08, indel=0.04)
    ef = EndsFree(target_begin=len(target), query_begin=len(query))
    check_alignment(query, target, PATCH, ef)


def test_empty_and_tiny():
    assert wfa_align(b"", b"", PATCH) == (0, [])
    score, ops = wfa_align(b"A", b"A", PATCH)
    assert (score, ops) == (0, [(1, "=")])
    score, ops = wfa_align(b"A", b"C", PATCH)
    assert score == min(PATCH.mismatch,
                        2 * PATCH.gap_opening1 + 2 * PATCH.gap_extension1,
                        PATCH.gap_opening1 + PATCH.gap_extension1
                        + PATCH.gap_opening2 + PATCH.gap_extension2)


def test_memory_budget_reroute(monkeypatch):
    """A block whose exact full-history footprint exceeds
    WFMASH_TPU_WFA_MEM_MB raises WfaMemoryBudget from the native engine
    and BudgetedHostEngine reroutes it through the segmented path,
    producing a replayable alignment instead of an OOM."""
    import wfmash_tpu.native as native
    from wfmash_tpu.align.engine import BudgetedHostEngine
    from wfmash_tpu.params import AlignParams

    if native.get_wfa_lib() is None:
        pytest.skip("native wfa unavailable")
    monkeypatch.setenv("WFMASH_TPU_WFA_MEM_MB", "8")

    rng = np.random.default_rng(3)
    query, target = make_pair(rng, 4000, sub=0.15, indel=0.02)
    with pytest.raises(native.WfaMemoryBudget):
        native.wfa_align_ops_native(query, target, PATCH)

    ap = AlignParams(ref_sequences=["x"], query_sequences=["x"],
                     mashmap_paf_file="x", threads=1)
    eng = BudgetedHostEngine(PATCH, ap)
    ops = eng.align(query, target)
    qc = sum(c for c, op in ops if op in "=XI")
    tc = sum(c for c, op in ops if op in "=XD")
    assert (qc, tc) == (len(query), len(target))


def test_host_engine_thread_pool_deterministic():
    """align_batch over a thread pool returns the same ops in the same
    order as the serial path (native WFA is thread-safe: thread-local
    arena, GIL released)."""
    from wfmash_tpu.align.biwfa import HostWfaEngine

    rng = np.random.default_rng(11)
    jobs = []
    for i in range(12):
        q, t = make_pair(rng, 600 + 40 * i, sub=0.05, indel=0.02)
        jobs.append((q, t, None))
    serial = HostWfaEngine(PATCH).align_batch(jobs)
    pooled_eng = HostWfaEngine(PATCH)
    pooled_eng.threads = 4
    pooled = pooled_eng.align_batch(jobs)
    assert pooled == serial
