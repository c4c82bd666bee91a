"""Device (XLA) L1 stage vs the host/native spec — bit-identical
candidate lists for the production split-mapping path."""

import numpy as np
import pytest

from wfmash_tpu.index.build import build_index
from wfmash_tpu.map import l1l2
from wfmash_tpu.map.l1_device import DeviceL1
from wfmash_tpu.map.stats import compute_sketch_cutoffs
from wfmash_tpu.params import MapParams
from wfmash_tpu.sketch.minhash import sketch_fragment

from util import random_dna


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(17)
    mp = MapParams(percentage_identity=0.85, auto_pct_identity=False,
                   window_length=500, kmer_size=15)
    mp.ref_sequences = mp.query_sequences = ["x"]
    mp = mp.finalize()
    base = random_dna(rng, 30_000)
    seqs = [(0, base), (1, base[5_000:25_000]), (2, base[2_000:17_000]),
            (3, random_dna(rng, 12_000))]
    index = build_index(mp, seqs, log=lambda m: None)
    group_arr = np.array([0, 1, 1, 2], np.int32)   # PanSN-style groups
    cutoffs = compute_sketch_cutoffs(mp.sketch_size, mp.kmer_size, 0.0,
                                     0.999)
    return rng, mp, base, index, group_arr, cutoffs


def host_candidates(sk, q_len, index, q_seqid, q_group, group_arr, mp,
                    cutoffs, min_hits):
    group_of = lambda ids: group_arr[np.asarray(ids, np.int64)]
    pts = l1l2.get_seed_interval_points(sk, index, q_seqid, q_group,
                                        group_of, mp)
    out = []
    groups = group_of(pts["seq_id"]) if len(pts) else []
    i, n = 0, len(pts)
    while i < n:
        j = i + 1
        if mp.skip_prefix:
            while j < n and groups[j] == groups[i]:
                j += 1
        else:
            j = n
        l1l2.compute_l1_candidate_regions(
            sk.sketch_size, q_len, pts[i:j], min_hits, mp, cutoffs, out)
        i = j
    return [(c.seq_id, c.range_start, c.range_end, c.intersection_size)
            for c in out]


def test_device_l1_bit_identical(setup):
    rng, mp, base, index, group_arr, cutoffs = setup
    dev = DeviceL1(index, group_arr, mp, cutoffs)
    frags = []
    expected = []
    min_hits = 2
    for trial in range(24):
        start = int(rng.integers(0, 29_000))
        fa = np.frombuffer(base[start:start + 500], np.uint8).copy()
        mut = rng.random(len(fa)) < (0.02 + 0.02 * (trial % 5))
        fa[mut] = rng.integers(65, 69, int(mut.sum()))
        frag = fa.tobytes()
        sk = sketch_fragment(frag, mp.kmer_size, mp.sketch_size)
        if sk.sketch_size == 0:
            continue
        q_seqid, q_group = 99, 99   # external query: no self-skip hits
        frags.append(dict(hashes=sk.hashes, n=sk.sketch_size,
                          q_len=len(frag), q_seqid=q_seqid,
                          q_group=q_group, min_hits=min_hits))
        expected.append(host_candidates(
            sk, len(frag), index, q_seqid, q_group, group_arr, mp,
            cutoffs, min_hits))
    got = dev.candidates(frags)
    n_checked = 0
    for g, e in zip(got, expected):
        assert g is not None, "unexpected overflow/fallback"
        assert g == e
        n_checked += 1
    assert n_checked >= 20
    assert any(len(e) > 0 for e in expected), "test produced no candidates"


def test_device_l1_self_group_skip(setup):
    """Fragments claiming membership in group 1 must skip seqs 1 and 2."""
    rng, mp, base, index, group_arr, cutoffs = setup
    dev = DeviceL1(index, group_arr, mp, cutoffs)
    fa = np.frombuffer(base[6_000:6_500], np.uint8)
    sk = sketch_fragment(fa.tobytes(), mp.kmer_size, mp.sketch_size)
    frag = dict(hashes=sk.hashes, n=sk.sketch_size, q_len=500,
                q_seqid=1, q_group=1, min_hits=2)
    got = dev.candidates([frag])[0]
    exp = host_candidates(sk, 500, index, 1, 1, group_arr, mp, cutoffs, 2)
    assert got == exp
    assert all(c[0] not in (1, 2) for c in got)
