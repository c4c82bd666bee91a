"""Device (XLA) L2 walk vs the host/native spec — bit-identical
L2Mapping lists for the production split-mapping path."""

import numpy as np
import pytest

from wfmash_tpu.index.build import build_index
from wfmash_tpu.map import l1l2
from wfmash_tpu.map.l2_device import DeviceL2
from wfmash_tpu.map.stats import compute_sketch_cutoffs
from wfmash_tpu.params import MapParams
from wfmash_tpu.sketch.minhash import sketch_fragment

from util import mutate, random_dna


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(23)
    mp = MapParams(percentage_identity=0.85, auto_pct_identity=False,
                   window_length=500, kmer_size=15)
    mp.ref_sequences = mp.query_sequences = ["x"]
    mp = mp.finalize()
    base = random_dna(rng, 40_000)
    seqs = [(0, base), (1, mutate(rng, base[5_000:30_000], 0.08)),
            (2, base[10_000:20_000][::-1]), (3, random_dna(rng, 15_000))]
    index = build_index(mp, seqs, log=lambda m: None)
    return rng, mp, base, index


def _host_l2(sk, q_len, cand, index, mp):
    return l1l2.compute_l2_mapped_regions(sk, q_len, cand, index, mp)


def test_device_l2_bit_identical(setup):
    rng, mp, base, index = setup
    dev = DeviceL2(index, mp)
    group_arr = np.array([0, 1, 2, 3], np.int64)
    cutoffs = compute_sketch_cutoffs(mp.sketch_size, mp.kmer_size, 0.0,
                                     0.999)

    rows = []
    expected = []
    for fi in range(40):
        off = int(rng.integers(0, 39_000))
        frag = bytes(base[off:off + mp.window_length])
        if fi % 3 == 1:
            frag = mutate(rng, frag, 0.10)
        sk = sketch_fragment(frag, mp.kmer_size, mp.sketch_size)
        if sk.sketch_size == 0:
            continue
        pts = l1l2.get_seed_interval_points(
            sk, index, 99, 99, lambda ids: group_arr[np.asarray(ids)], mp)
        if len(pts) == 0:
            continue
        l1 = []
        l1l2.compute_l1_candidate_regions(
            sk.sketch_size, len(frag), pts, 2, mp, cutoffs, l1)
        for cand in l1[:4]:
            rows.append((sk, len(frag), cand))
            expected.append(_host_l2(sk, len(frag), cand, index, mp))
    assert len(rows) > 20, "fixture produced too few candidates"
    got = dev.walk(rows)
    n_dev = 0
    for g, e, (sk, ql, cand) in zip(got, expected, rows):
        if g is None:
            continue                      # host fallback rows
        n_dev += 1
        assert len(g) == len(e), (cand, g, e)
        for a, b in zip(g, e):
            assert (a.seq_id, a.mean_optimal_pos, a.optimal_start,
                    a.optimal_end, a.shared_sketch_size, a.strand) == \
                   (b.seq_id, b.mean_optimal_pos, b.optimal_start,
                    b.optimal_end, b.shared_sketch_size, b.strand)
    assert n_dev > 20, f"too many host fallbacks ({n_dev} on device)"
