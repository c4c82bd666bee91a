"""Native C++ winnow scanner vs the Python executable spec."""

import numpy as np
import pytest

from wfmash_tpu.native import winnow_minmers_native
from wfmash_tpu.sketch.winnow import winnow_minmers

from util import random_dna


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("k,w,s", [(5, 20, 3), (15, 100, 10), (15, 300, 29)])
def test_native_matches_python(seed, k, w, s):
    rng = np.random.default_rng(seed)
    seq = bytearray(random_dna(rng, 1500))
    # sprinkle Ns and lowercase
    seq[40:45] = b"NNNNN"
    seq[300:330] = bytes(seq[300:330]).lower()
    seq = bytes(seq)
    nat = winnow_minmers_native(seq, k, w, s, seq_id=7)
    if nat is None:
        pytest.skip("native library unavailable")
    py = winnow_minmers(seq, k, w, s, seq_id=7)
    assert len(nat) == len(py)
    for f in ("hash", "wpos", "wpos_end", "seq_id", "strand"):
        np.testing.assert_array_equal(nat[f], py[f])


def test_native_l1l2_bit_identical():
    """Native l1_sweep/l2_walk vs the Python specs on random data."""
    import numpy as np

    import wfmash_tpu.native as native
    from wfmash_tpu.index.build import build_index
    from wfmash_tpu.map import l1l2
    from wfmash_tpu.params import MapParams
    from wfmash_tpu.sketch.minhash import sketch_fragment
    from util import random_dna

    if native.get_l1l2_lib() is None:
        import pytest

        pytest.skip("native l1l2 unavailable")

    rng = np.random.default_rng(9)
    mp = MapParams(percentage_identity=0.85, auto_pct_identity=False,
                   window_length=500, kmer_size=15)
    mp.ref_sequences = mp.query_sequences = ["x"]
    mp = mp.finalize()
    base = random_dna(rng, 30_000)
    seqs = [(0, base), (1, base[5_000:25_000])]
    index = build_index(mp, seqs, log=lambda m: None)

    from wfmash_tpu.map.stats import compute_sketch_cutoffs
    cutoffs = compute_sketch_cutoffs(
        mp.sketch_size, mp.kmer_size, 0.0, 0.999)

    def run_all(frag):
        sk = sketch_fragment(frag, mp.kmer_size, mp.sketch_size)
        if sk.sketch_size == 0:
            return None
        pts = l1l2.get_seed_interval_points(
            sk, index, 99, 99, lambda ids: np.asarray(ids) * 0 + 7, mp)
        if len(pts) == 0:
            return None
        out = []
        l1l2.compute_l1_candidate_regions(
            sk.sketch_size, len(frag), pts, 2, mp, cutoffs, out)
        l2s = []
        for cand in out:
            l2s.extend(l1l2.compute_l2_mapped_regions(
                sk, len(frag), cand, index, mp))
        return out, l2s

    for trial in range(6):
        start = int(rng.integers(0, 29_000))
        frag = bytes(
            bytearray(base[start:start + 500]))
        # sprinkle mutations
        fa = np.frombuffer(frag, np.uint8).copy()
        mut = rng.random(len(fa)) < 0.05
        fa[mut] = rng.integers(65, 69, int(mut.sum()))
        frag = fa.tobytes()

        res_native = run_all(frag)
        # force python path
        saved = (native._lib2, native._tried2)
        native._lib2, native._tried2 = None, True
        try:
            res_python = run_all(frag)
        finally:
            native._lib2, native._tried2 = saved
        assert (res_native is None) == (res_python is None)
        if res_native is None:
            continue
        l1n, l2n = res_native
        l1p, l2p = res_python
        assert [(c.seq_id, c.range_start, c.range_end, c.intersection_size)
                for c in l1n] == \
               [(c.seq_id, c.range_start, c.range_end, c.intersection_size)
                for c in l1p]
        assert [(m.seq_id, m.mean_optimal_pos, m.optimal_start,
                 m.optimal_end, m.shared_sketch_size, m.strand)
                for m in l2n] == \
               [(m.seq_id, m.mean_optimal_pos, m.optimal_start,
                 m.optimal_end, m.shared_sketch_size, m.strand)
                for m in l2p]


def test_native_l1_sweep_multi_matches_per_group():
    """l1_sweep_multi (one call, all groups + join) vs the per-group
    compute_l1_candidate_regions loop it replaced (engine._host_l1)."""
    import numpy as np

    import wfmash_tpu.native as native
    from wfmash_tpu.index.build import build_index
    from wfmash_tpu.map import l1l2
    from wfmash_tpu.map.stats import compute_sketch_cutoffs
    from wfmash_tpu.params import MapParams
    from wfmash_tpu.sketch.minhash import sketch_fragment
    from util import random_dna

    if native.get_l1l2_lib() is None:
        import pytest

        pytest.skip("native l1l2 unavailable")

    rng = np.random.default_rng(17)
    mp = MapParams(percentage_identity=0.85, auto_pct_identity=False,
                   window_length=500, kmer_size=15)
    mp.ref_sequences = mp.query_sequences = ["x"]
    mp = mp.finalize()
    base = random_dna(rng, 24_000)
    # several sequences -> several groups (group = seq_id here)
    seqs = [(0, base[:12_000]), (1, base[6_000:18_000]),
            (2, base[10_000:24_000]), (3, base[2_000:9_000])]
    index = build_index(mp, seqs, log=lambda m: None)
    cutoffs = compute_sketch_cutoffs(mp.sketch_size, mp.kmer_size,
                                     0.0, 0.999)
    group_of = lambda ids: np.asarray(ids)  # one group per seq

    for trial in range(8):
        start = int(rng.integers(0, 23_000))
        fa = np.frombuffer(base[start:start + 700], np.uint8).copy()
        mut = rng.random(len(fa)) < 0.04
        fa[mut] = rng.integers(65, 69, int(mut.sum()))
        frag = fa.tobytes()
        sk = sketch_fragment(frag, mp.kmer_size, mp.sketch_size)
        if sk.sketch_size == 0:
            continue
        pts = l1l2.get_seed_interval_points(sk, index, 99, 99,
                                            group_of, mp)
        n = len(pts)
        if n == 0:
            continue
        window_len = max(0, len(frag) - mp.window_length)

        # reference: per-group loop through the spec entry point
        groups = group_of(pts["seq_id"])
        ref: list = []
        i = 0
        while i < n:
            j = i + 1
            while j < n and groups[j] == groups[i]:
                j += 1
            l1l2.compute_l1_candidate_regions(
                sk.sketch_size, len(frag), pts[i:j], 2, mp, cutoffs, ref)
            i = j

        cut = np.flatnonzero(groups[1:] != groups[:-1]) + 1
        grp_b = np.concatenate(([0], cut, [n])).astype(np.int64)
        got = native.l1_sweep_multi_native(
            np.ascontiguousarray(pts["pos"], dtype=np.int64),
            np.ascontiguousarray(pts["seq_id"], dtype=np.int64),
            np.ascontiguousarray(pts["side"], dtype=np.int8),
            np.ascontiguousarray(pts["hash"], dtype=np.uint64),
            grp_b, window_len, 2, mp.stage1_topANI_filter,
            mp.stage2_full_scan, sk.sketch_size,
            max(1.0, mp.sketch_size / 1000.0), cutoffs,
            mp.window_length)
        expect = [(c.seq_id, c.range_start, c.range_end,
                   c.intersection_size) for c in ref]
        assert got == expect

        # the fused per-fragment call (gather+filter+sort in C++) must
        # agree with the same per-group loop
        starts, ends = index.lookup(sk.hashes)
        group_arr = np.arange(100, dtype=np.int64)  # group == seq_id
        frag = native.l1_fragment_native(
            index.endpoints_soa(),
            np.ascontiguousarray(starts, np.int64),
            np.ascontiguousarray(ends, np.int64),
            group_arr, 99, 99, True, False, True,
            window_len, 2, mp.stage1_topANI_filter, mp.stage2_full_scan,
            sk.sketch_size, max(1.0, mp.sketch_size / 1000.0), cutoffs,
            mp.window_length)
        assert frag == expect


def test_native_lis_chain_bit_identical():
    """Native LIS vs the Python patience-sort spec, including ties."""
    import numpy as np

    from wfmash_tpu.align import segmented as S
    from wfmash_tpu.native import lis_chain_native

    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(1, 500))
        qpos = np.sort(rng.integers(0, 1000, n).astype(np.int64))
        tpos = rng.integers(0, 1000, n).astype(np.int64)
        order = np.lexsort((tpos, qpos))
        t = tpos[order]
        got = lis_chain_native(t)
        if got is None:
            import pytest

            pytest.skip("native anchors unavailable")
        # python reference on the same sorted order
        tails, tails_idx = [], []
        parent = np.full(n, -1, np.int64)
        import bisect

        for i in range(n):
            j = bisect.bisect_left(tails, t[i])
            if j > 0:
                parent[i] = tails_idx[j - 1]
            if j == len(tails):
                tails.append(t[i])
                tails_idx.append(i)
            else:
                tails[j] = t[i]
                tails_idx[j] = i
        ref = []
        i = tails_idx[-1]
        while i >= 0:
            ref.append(i)
            i = parent[i]
        ref.reverse()
        assert list(got) == ref, trial


def test_native_wfa_bit_identical():
    """Native C++ WFA (native/wfa.cpp) vs the vectorized Python spec
    (wfa_vec.wfa_align_py): exact (score, ops) equality over random
    end-to-end, ends-free, and score-capped problems."""
    import random

    import pytest

    from wfmash_tpu.align.wfa_np import EndsFree, Penalties
    from wfmash_tpu.align.wfa_vec import wfa_align_py
    from wfmash_tpu.native import wfa_align_ops_native

    p = Penalties(5, 8, 2, 24, 1)
    rng = random.Random(11)
    bases = b"ACGT"

    def mutate(s, div, indel):
        out = bytearray()
        for ch in s:
            r = rng.random()
            if r < indel:
                if rng.random() < 0.5:
                    out.append(rng.choice(bases))
                    out.append(ch)
            elif r < indel + div:
                out.append(rng.choice(bases))
            else:
                out.append(ch)
        return bytes(out)

    if wfa_align_ops_native(b"A", b"A", p) is NotImplemented:
        pytest.skip("native wfa unavailable")

    cases = [(b"", b""), (b"", b"ACGT"), (b"ACGT", b""), (b"A", b"C")]
    for q, t in cases:
        for ef in (None,
                   EndsFree(target_begin=len(t), query_begin=len(q)),
                   EndsFree(target_end=len(t), query_end=len(q))):
            assert wfa_align_ops_native(q, t, p, ef) == \
                wfa_align_py(q, t, p, ef)

    for trial in range(120):
        L = rng.randrange(0, 300)
        t = bytes(rng.choice(bases) for _ in range(L))
        q = mutate(t, rng.random() * 0.4, rng.random() * 0.1)
        ef = None
        if trial % 3 == 1:
            ef = EndsFree(target_begin=rng.randrange(0, L + 1),
                          query_begin=rng.randrange(0, len(q) + 1))
        elif trial % 3 == 2:
            ef = EndsFree(target_end=rng.randrange(0, L + 1),
                          query_end=rng.randrange(0, len(q) + 1),
                          target_begin=rng.randrange(0, 3),
                          query_begin=rng.randrange(0, 3))
        ms = rng.randrange(1, 400) if trial % 5 == 0 else None
        got = wfa_align_ops_native(q, t, p, ef, ms)
        want = wfa_align_py(q, t, p, ef, ms)
        assert got == want, (trial, len(q), L, ef, ms)


def test_canonical_hashes_native_vs_python():
    """Native batch k-mer hasher is bit-identical to the numpy path
    (sketch.kmers.canonical_kmer_hashes without the native shortcut)."""
    import random

    import numpy as np

    from wfmash_tpu.native import canonical_hashes_native
    from wfmash_tpu.sketch.kmers import (
        kmer_window_matrix, normalize, reverse_complement, valid_kmer_mask,
    )
    from wfmash_tpu.sketch.murmur import murmur3_x64_128_low64

    if canonical_hashes_native(b"ACGTACGTACGTACGTACGT", 15) is None:
        pytest.skip("native winnow lib unavailable")

    def python_path(seq, k):
        s = normalize(seq)
        n = len(s) - k + 1
        if n <= 0:
            return (np.empty(0, np.int64), np.empty(0, np.uint64),
                    np.empty(0, np.int8))
        fwd = murmur3_x64_128_low64(kmer_window_matrix(s, k))
        rc = reverse_complement(s)
        bwd = murmur3_x64_128_low64(kmer_window_matrix(rc, k))[::-1]
        keep = valid_kmer_mask(s, k) & (fwd != bwd)
        pos = np.nonzero(keep)[0].astype(np.int64)
        return (pos, np.minimum(fwd[keep], bwd[keep]),
                np.where(fwd[keep] < bwd[keep], 1, -1).astype(np.int8))

    rng = random.Random(11)
    for trial in range(40):
        L = rng.randrange(1, 400)
        seq = bytes(rng.choice(b"ACGTNacgtnX") for _ in range(L))
        for k in (5, 15, 19, 21):
            s = normalize(seq)
            got = canonical_hashes_native(s.tobytes(), k)
            want = python_path(seq, k)
            for g, w in zip(got, want):
                assert np.array_equal(g, w), (trial, k, L)


def test_find_anchors_native_vs_python():
    """Native anchor-chain planning is bit-identical to the numpy path
    (segmented.find_anchors without the native shortcut)."""
    import numpy as np

    import wfmash_tpu.align.segmented as S
    from wfmash_tpu.native import find_anchors_native

    if find_anchors_native(b"ACGT" * 20, b"ACGT" * 20, 21, 1, 1000) is None:
        pytest.skip("native anchors lib unavailable")

    def py_find_anchors(q, t, k, max_occ=1, max_pairs=200_000):
        qc, qv = S._kmer_codes(q, k)
        tc, tv = S._kmer_codes(t, k)
        if max_occ <= 1:
            return S._match_chain(qc, qv, tc, tv)
        cq, pq = S._rare_positions(qc, qv, max_occ)
        ct, pt = S._rare_positions(tc, tv, max_occ)
        if len(cq) == 0 or len(ct) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        tmap, prev = {}, None
        for c, p in zip(ct.tolist(), pt.tolist()):
            if c != prev:
                tmap[c] = [p]
                prev = c
            else:
                tmap[c].append(p)
        qs, ts = [], []
        for c, p in zip(cq.tolist(), pq.tolist()):
            hits = tmap.get(c)
            if hits:
                for tp in hits:
                    qs.append(p)
                    ts.append(tp)
                if len(qs) > max_pairs:
                    break
        qpos = np.asarray(qs, np.int64)
        tpos = np.asarray(ts, np.int64)
        keep = S._lis_chain(qpos, tpos)
        qpos, tpos = qpos[keep], tpos[keep]
        if len(qpos) > 1:
            mono = np.concatenate(([True], np.diff(qpos) > 0))
            qpos, tpos = qpos[mono], tpos[mono]
        return qpos, tpos

    rng = np.random.default_rng(13)
    lut = np.frombuffer(b"ACGTN", np.uint8)
    for trial in range(40):
        L = int(rng.integers(30, 1500))
        t = lut[rng.integers(0, 4, L)]
        q = t.copy()
        mut = rng.random(L) < rng.random() * 0.3
        q[mut] = lut[rng.integers(0, 4, int(mut.sum()))]
        if trial % 4 == 0:
            q[rng.integers(0, L, 5)] = ord("N")
        if trial % 3 == 0:
            cut = int(rng.integers(0, L))
            q = np.concatenate([q[:cut], q[cut + int(rng.integers(0, 40)):]])
        mp = 37 if trial % 5 == 0 else 200_000
        for (k, mo) in ((21, 1), (13, 4), (11, 8)):
            a = find_anchors_native(q.tobytes(), t.tobytes(), k, mo, mp)
            b = py_find_anchors(q, t, k, mo, mp)
            assert np.array_equal(a[0], b[0]), (trial, k, mo)
            assert np.array_equal(a[1], b[1]), (trial, k, mo)


def test_native_place_short_matches_python():
    """anchors.cpp:place_short vs the Python diagonal-voting spec."""
    import numpy as np

    import wfmash_tpu.native as native
    from wfmash_tpu.align import segmented as S
    from util import random_dna

    if native.get_anchors_lib() is None:
        import pytest

        pytest.skip("native anchors unavailable")

    rng = np.random.default_rng(23)
    for trial in range(40):
        llen = int(rng.integers(300, 4000))
        slen = int(rng.integers(64, max(65, llen // 2)))
        long_ = random_dna(rng, llen)
        off = int(rng.integers(0, llen - slen + 1))
        if trial % 3 == 0:
            short = random_dna(rng, slen)         # junk: no signal
        else:
            sa = np.frombuffer(long_[off:off + slen], np.uint8).copy()
            mut = rng.random(slen) < 0.05
            sa[mut] = rng.integers(65, 69, int(mut.sum()))
            short = sa.tobytes()
        # python spec (forced)
        saved = (native._lib3, native._tried3)
        native._lib3, native._tried3 = None, True
        try:
            ref = S._place_short(short, long_)
        finally:
            native._lib3, native._tried3 = saved
        got = S._place_short(short, long_)
        assert got == ref, (trial, got, ref)


def test_native_plan_block_vs_python():
    """anchors.cpp:plan_block (the fused k-ladder + cut-pick +
    refinement planner) is bit-identical to segmented._plan_bounds_py."""
    import numpy as np

    import wfmash_tpu.align.segmented as S
    from wfmash_tpu.native import plan_block_native

    if plan_block_native(b"ACGT" * 200, b"ACGT" * 200, 256, 512, 256) \
            is NotImplemented:
        pytest.skip("native anchors lib unavailable")

    rng = np.random.default_rng(29)
    lut = np.frombuffer(b"ACGT", np.uint8)
    for trial in range(25):
        L = int(rng.integers(300, 12000))
        t = lut[rng.integers(0, 4, L)]
        q = t.copy()
        mut = rng.random(L) < rng.random() * 0.5
        q[mut] = lut[rng.integers(0, 4, int(mut.sum()))]
        if trial % 3 == 0:          # structural insertion
            cut = int(rng.integers(0, L))
            ins = lut[rng.integers(0, 4, int(rng.integers(0, 2000)))]
            q = np.concatenate([q[:cut], ins, q[cut:]])
        qb, tb = q.tobytes(), t.tobytes()
        for st in (256, 128):
            nat = plan_block_native(qb, tb, st, 512, 256)
            py = S._plan_bounds_py(qb, tb, st, 512, 256)
            if py is None:
                assert nat is None, (trial, st)
            else:
                assert nat is not None, (trial, st)
                assert list(nat[0]) == list(py[0]), (trial, st)
                assert list(nat[1]) == list(py[1]), (trial, st)


def test_native_segmented_solve_vs_python():
    """segsolve.cpp:segmented_solve (whole-block plan + placement +
    capped pieces + refinement recursion + stitch in ONE call) is
    bit-identical to the Python spec segmented_host_align."""
    import numpy as np

    import wfmash_tpu.align.segmented as S
    import wfmash_tpu.native as native
    from wfmash_tpu.align.biwfa import Penalties
    from wfmash_tpu.native import segmented_solve_native

    p = Penalties(5, 8, 2, 24, 1)
    if segmented_solve_native(b"ACGT" * 600, b"ACGT" * 600, p, 256, 500) \
            is NotImplemented:
        pytest.skip("native segsolve lib unavailable")

    rng = np.random.default_rng(31)
    lut = np.frombuffer(b"ACGT", np.uint8)
    cases = []
    for trial in range(12):
        L = int(rng.integers(2000, 12000))
        t = lut[rng.integers(0, 4, L)]
        q = t.copy()
        mut = rng.random(L) < rng.random() * 0.4
        q[mut] = lut[rng.integers(0, 4, int(mut.sum()))]
        if trial % 3 == 0:          # structural insertion -> placement
            cut = int(rng.integers(0, L))
            ins = lut[rng.integers(0, 4, int(rng.integers(500, 2500)))]
            q = np.concatenate([q[:cut], ins, q[cut:]])
        if trial % 4 == 0:          # divergent core -> refine recursion
            a = int(rng.integers(0, max(1, len(q) - 1500)))
            q[a:a + 1500] = lut[rng.integers(0, 4, min(1500, len(q) - a))]
        cases.append((q.tobytes(), t.tobytes()))
    cases.append((bytes(lut[rng.integers(0, 4, 4000)]),
                  bytes(lut[rng.integers(0, 4, 4000)])))   # junk
    saved = native.segmented_solve_native
    for i, (qb, tb) in enumerate(cases):
        nat = segmented_solve_native(qb, tb, p, 256, 500)
        try:
            native.segmented_solve_native = \
                lambda *a, **k: NotImplemented
            py = S.segmented_host_align(qb, tb, p)
        finally:
            native.segmented_solve_native = saved
        assert nat == py, (i, type(nat), type(py))


def test_native_chain_roots_vs_python():
    """l1l2.cpp:chain_roots (union-find chain merge) is bit-identical to
    the Python spec path of merge_mappings_with_chains — including the
    dset64 rank/tie rules the downstream chain ids observe."""
    import numpy as np

    import wfmash_tpu.map.chain as CH
    import wfmash_tpu.native as native
    from wfmash_tpu.map.l1l2 import FLAG_REV, MAPPING_DTYPE
    from wfmash_tpu.params import MapParams

    if native.get_l1l2_lib() is None:
        pytest.skip("native l1l2 lib unavailable")

    rng = np.random.default_rng(41)
    params = MapParams(ref_sequences=["x"], query_sequences=["y"],
                       split=True)
    for trial in range(15):
        n = int(rng.integers(2, 400))
        m = np.zeros(n, MAPPING_DTYPE)
        m["ref_seq_id"] = rng.integers(0, 3, n)
        m["ref_start"] = rng.integers(0, 50000, n)
        m["query_start"] = rng.integers(0, 50000, n)
        m["block_length"] = rng.integers(100, 3000, n)
        m["flags"] = np.where(rng.random(n) < 0.4, FLAG_REV, 0)
        m["nuc_identity"] = rng.integers(8000, 10000, n)
        m["kmer_complexity"] = rng.integers(0, 100, n)
        m["conserved_sketches"] = rng.integers(0, 50, n)
        max_dist = int(rng.integers(500, 8000))
        got = CH.merge_mappings_with_chains(m.copy(), max_dist, params)
        saved = native.chain_roots_native
        try:
            native.chain_roots_native = lambda *a, **k: None
            want = CH.merge_mappings_with_chains(m.copy(), max_dist,
                                                 params)
        finally:
            native.chain_roots_native = saved
        assert np.array_equal(got[0], want[0]), trial
        assert np.array_equal(got[1], want[1]), trial


def test_find_anchors_density_sampling_big_blocks():
    """The stride-4 query-position sampling rule for unique anchors on
    >16384 bp blocks is applied identically by the native and numpy
    paths (it is part of the find_anchors spec)."""
    import numpy as np

    import wfmash_tpu.align.segmented as S
    from wfmash_tpu.native import find_anchors_native

    if find_anchors_native(b"ACGT" * 20, b"ACGT" * 20, 21, 1, 1000) is None:
        pytest.skip("native anchors lib unavailable")

    rng = np.random.default_rng(53)
    lut = np.frombuffer(b"ACGT", np.uint8)
    for trial in range(4):
        L = int(rng.integers(17000, 40000))
        t = lut[rng.integers(0, 4, L)]
        q = t.copy()
        mut = rng.random(L) < 0.02
        q[mut] = lut[rng.integers(0, 4, int(mut.sum()))]
        nat = find_anchors_native(q.tobytes(), t.tobytes(), 21, 1,
                                  200_000)
        qc, qv = S._kmer_codes(q, 21)
        tc, tv = S._kmer_codes(t, 21)
        qv = qv & (np.arange(len(qv)) % 4 == 0)
        py = S._match_chain(qc, qv, tc, tv)
        assert np.array_equal(nat[0], py[0]), trial
        assert np.array_equal(nat[1], py[1]), trial
        # sampled positions only
        assert (nat[0] % 4 == 0).all(), trial


def test_budgeted_engine_batch_matches_per_job():
    """BudgetedHostEngine.align_batch (one native host_align_blocks
    call for the mains + one batched ends-free call for the patches,
    reversed-head transform included) returns exactly what the per-job
    align() spec path returns, across main blocks of every routing
    class and head/tail/partial ends-free jobs."""
    import numpy as np

    import wfmash_tpu.align.engine as E
    from wfmash_tpu.align.biwfa import EndsFree, Penalties
    from wfmash_tpu.params import AlignParams

    ap = AlignParams(ref_sequences=["x"], query_sequences=["y"]
                     ).finalize(1000)
    eng = E.BudgetedHostEngine(Penalties(5, 8, 2, 24, 1), ap)
    rng = np.random.default_rng(23)
    lut = np.frombuffer(b"ACGT", np.uint8)

    def seqs(n, d):
        t = bytes(lut[rng.integers(0, 4, n)])
        q = bytearray(t)
        for _ in range(int(n * d)):
            q[int(rng.integers(0, n))] = int(lut[rng.integers(0, 4)])
        return bytes(q), t

    jobs = []
    for i in range(24):
        n = int(rng.integers(100, 4000))
        q, t = seqs(n, rng.random() * 0.25)
        kind = i % 6
        if kind == 0:       # probe-pass candidate (near-identical, big)
            q, t = seqs(3000, 0.002)
            jobs.append((q, t, None))
        elif kind == 1:     # probe-fail -> segmented (divergent, big)
            q, t = seqs(3000, 0.15)
            jobs.append((q, t, None))
        elif kind == 2:     # small block, plain exact
            jobs.append((q[:800], t[:800], None))
        elif kind == 3:     # head patch (reversal transform)
            jobs.append((q, t, EndsFree(target_begin=len(t),
                                        query_begin=len(q))))
        elif kind == 4:     # tail patch
            jobs.append((q, t, EndsFree(target_end=len(t),
                                        query_end=len(q))))
        else:               # partial head frees
            jobs.append((q, t, EndsFree(
                target_begin=int(rng.integers(0, 8)),
                query_begin=len(q))))
    # unanchorable junk block >= 2000 (probe fail + unplannable)
    jobs.append((bytes(lut[rng.integers(0, 4, 2500)]),
                 bytes(lut[rng.integers(0, 4, 2500)]), None))

    batch = eng.align_batch(jobs)
    solo = [eng.align(*j) for j in jobs]
    for i, (a, b) in enumerate(zip(batch, solo)):
        assert a == b, (i, jobs[i][2])


def test_native_libs_ubsan_clean():
    """All five native libs compile and run clean under UBSAN
    (-fno-sanitize-recover aborts on any UB): the sanitizer analogue of
    the reference's CI sanitizer builds (SURVEY §5 aux subsystems).
    Runs a representative workload through every lib in a subprocess
    with fresh WFMASH_TPU_SANITIZE=1 builds."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    prog = r"""
import numpy as np
from wfmash_tpu.native import (
    canonical_hashes_native, chain_roots_native, find_anchors_native,
    host_align_blocks_native, place_short_native, plan_block_native,
    segmented_solve_native, wfa_align_batch_native,
    wfa_align_ops_native, winnow_minmers_native,
)
from wfmash_tpu.align.biwfa import Penalties

rng = np.random.default_rng(3)
lut = np.frombuffer(b"ACGT", np.uint8)
seq = bytes(lut[rng.integers(0, 4, 20000)])
assert winnow_minmers_native(seq, 15, 100, 20) is not None
assert canonical_hashes_native(seq[:500], 15) is not None
t = seq[:6000]
q = bytearray(t)
for _ in range(400):
    q[int(rng.integers(0, len(t)))] = int(lut[rng.integers(0, 4)])
q = bytes(q)
p = Penalties(5, 8, 2, 24, 1)
assert find_anchors_native(q, t, 21, 1, 200000) is not None
assert find_anchors_native(q, t, 11, 8, 200000) is not None
assert place_short_native(t[:500], q, 13, 8) is not NotImplemented
assert plan_block_native(q, t, 256, 512, 256) is not NotImplemented
assert segmented_solve_native(q, t, p, 256, 800) is not NotImplemented
assert wfa_align_ops_native(q[:900], t[:900], p) is not NotImplemented
assert wfa_align_batch_native(
    [(q[:300], t[:300]), (q[300:600], t[280:620])], p,
    ends_free=[None, (0, 40, 0, 40)]) is not None
assert host_align_blocks_native(
    [(q, t), (q[:800], t[:800])], p, 300, 2000, 256, 800) \
    is not NotImplemented
assert chain_roots_native(
    np.zeros(4, np.int64), np.ones(4, np.int8),
    np.array([0, 100, 250, 900], np.int64),
    np.array([90, 200, 380, 990], np.int64),
    np.array([0, 110, 240, 900], np.int64),
    np.array([95, 205, 370, 995], np.int64),
    np.arange(4, dtype=np.int64), 500, 200) is not None
print("UBSAN-OK")
"""
    # sanitized builds use separate *.san.so cache names (native
    # __init__ keys the lib path on WFMASH_TPU_SANITIZE), so the
    # regular cached libs are untouched
    env = dict(
        os.environ, WFMASH_TPU_SANITIZE="1",
        UBSAN_OPTIONS="print_stacktrace=1",
    )
    r = subprocess.run(
        [sys.executable, "-c", prog], env=env, cwd=str(Path.cwd()),
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout, r.stderr[-2000:])
    assert "UBSAN-OK" in r.stdout
    assert "runtime error" not in r.stderr, r.stderr[-2000:]


def test_sketch_fragments_native_vs_python():
    """winnow.cpp:sketch_fragments (all of a query's bottom-s fragment
    sketches in one call) is bit-identical to the per-fragment spec
    sketch_fragment — hashes, positions, strand votes, complexity."""
    import numpy as np

    from wfmash_tpu.native import sketch_fragments_native
    from wfmash_tpu.sketch.minhash import sketch_fragment

    if sketch_fragments_native(b"ACGT" * 300, 15, 400, 30) is None:
        pytest.skip("native winnow lib unavailable")

    rng = np.random.default_rng(61)
    lut = np.frombuffer(b"ACGTN", np.uint8)
    for trial in range(8):
        L = int(rng.integers(500, 15000))
        w = int(rng.choice([500, 1000]))
        s = int(rng.choice([20, 85]))
        if trial % 3 == 0:
            seq = bytes(lut[rng.choice(
                5, L, p=[.245, .245, .245, .245, .02])])
        else:
            seq = bytes(lut[rng.integers(0, 4, L)])
        n_main = L // w
        frags = [seq[i * w:(i + 1) * w] for i in range(n_main)]
        if n_main >= 1 and L % w:
            frags.append(seq[L - w:])
        nat = sketch_fragments_native(seq, 15, w, s)
        assert len(nat) == len(frags), trial
        for f, (frag, sk_n) in enumerate(zip(frags, nat)):
            sk_p = sketch_fragment(frag, 15, s)
            assert np.array_equal(sk_n.hashes, sk_p.hashes), (trial, f)
            assert np.array_equal(sk_n.wpos, sk_p.wpos), (trial, f)
            assert np.array_equal(sk_n.wpos_end, sk_p.wpos_end)
            assert np.array_equal(sk_n.strand, sk_p.strand), (trial, f)
            assert sk_n.sketch_size == sk_p.sketch_size, (trial, f)
            assert sk_n.kmer_complexity == sk_p.kmer_complexity, (trial, f)
