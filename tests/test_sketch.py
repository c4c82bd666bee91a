"""Sketch-layer tests: normalization, canonical hashing, fragment bottom-s
sketches, and the windowed minmer machine — each validated against direct
brute-force oracles that implement the reference semantics literally.
"""

import numpy as np
import pytest

from wfmash_tpu.sketch.kmers import (
    canonical_kmer_hashes,
    normalize,
    reverse_complement,
    valid_kmer_mask,
)
from wfmash_tpu.sketch.minhash import sketch_fragment
from wfmash_tpu.sketch.murmur import murmur3_low64_scalar
from wfmash_tpu.sketch.winnow import winnow_minmers, _hash_stream


def random_dna(rng, n, n_prob=0.0, lower_prob=0.0):
    bases = rng.choice(list(b"ACGT"), size=n)
    if n_prob:
        bases[rng.random(n) < n_prob] = ord("N")
    if lower_prob:
        low = rng.random(n) < lower_prob
        bases[low] += 32
    return bytes(bases.astype(np.uint8))


def test_normalize():
    out = normalize(b"acgtACGTnNxY-")
    assert bytes(out) == b"ACGTACGTNNNNN"


def test_reverse_complement():
    s = normalize(b"ACGTN")
    assert bytes(reverse_complement(s)) == b"NACGT"


def test_valid_kmer_mask():
    s = normalize(b"ACGTNACGTACG")
    mask = valid_kmer_mask(s, 4)
    # windows containing index 4 ('N') are invalid
    expected = [i + 4 <= 4 or i > 4 for i in range(len(s) - 3)]
    assert list(mask) == expected


def brute_canonical(seq, k):
    """Literal per-position implementation of sketchSequence's hashing."""
    s = bytes(normalize(seq))
    rc = bytes(reverse_complement(np.frombuffer(s, dtype=np.uint8)))
    out = []
    for i in range(len(s) - k + 1):
        kmer = s[i : i + k]
        if b"N" in kmer:
            continue
        fwd = murmur3_low64_scalar(kmer)
        bwd = murmur3_low64_scalar(rc[len(s) - i - k : len(s) - i])
        if fwd == bwd:
            continue
        out.append((i, min(fwd, bwd), 1 if fwd < bwd else -1))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_canonical_hashes_vs_bruteforce(seed):
    rng = np.random.default_rng(seed)
    seq = random_dna(rng, 300, n_prob=0.02, lower_prob=0.3)
    pos, canon, vote = canonical_kmer_hashes(seq, 15)
    brute = brute_canonical(seq, 15)
    assert list(pos) == [b[0] for b in brute]
    assert [int(h) for h in canon] == [b[1] for b in brute]
    assert list(vote) == [b[2] for b in brute]


def brute_sketch(seq, k, s):
    """Bottom-s distinct hashes with first/last occurrence and vote sign."""
    kmers = brute_canonical(seq, k)
    by_hash = {}
    for i, h, v in kmers:
        e = by_hash.setdefault(h, [i, i, 0])
        e[1] = i
        e[2] += v
    kept = sorted(by_hash)[:s]
    return [
        (h, by_hash[h][0], by_hash[h][1], int(np.sign(by_hash[h][2])))
        for h in kept
    ]


@pytest.mark.parametrize("seed", [0, 3, 7])
@pytest.mark.parametrize("s", [5, 20])
def test_fragment_sketch_vs_bruteforce(seed, s):
    rng = np.random.default_rng(seed)
    seq = random_dna(rng, 500, n_prob=0.01)
    sk = sketch_fragment(seq, 15, s)
    brute = brute_sketch(seq, 15, s)
    assert sk.sketch_size == len(brute)
    assert [int(h) for h in sk.hashes] == [b[0] for b in brute]
    assert list(sk.wpos) == [b[1] for b in brute]
    assert list(sk.wpos_end) == [b[2] for b in brute]
    assert list(sk.strand) == [b[3] for b in brute]
    # ascending hash order
    assert np.all(np.diff(sk.hashes.astype(np.uint64)) > 0)


def test_fragment_sketch_complexity():
    rng = np.random.default_rng(5)
    seq = random_dna(rng, 500)
    sk = sketch_fragment(seq, 15, 30)
    max01 = float(sk.hashes[-1]) / float(0xFFFFFFFFFFFFFFFF)
    expected = (sk.sketch_size / max01) / ((500 - 15 + 1) * 2)
    assert sk.kmer_complexity == pytest.approx(expected)


# ---------------------------------------------------------------------------
# Windowed minmer oracle
# ---------------------------------------------------------------------------

def brute_window_membership(seq, k, w, s):
    """Per-window bottom-s-distinct membership using addMinmers' validity."""
    canon, vote, valid = _hash_stream(seq, k)
    n = len(canon)
    m = w - k + 1
    member = {}  # hash -> set of window ids
    for W in range(0, n - m + 1):
        hashes = sorted({int(canon[p]) for p in range(W, W + m) if valid[p]})
        for h in hashes[:s]:
            member.setdefault(h, set()).add(W)
    return member


@pytest.mark.parametrize("seed", list(range(6)))
@pytest.mark.parametrize("k,w,s", [(5, 20, 3), (7, 40, 5), (15, 100, 10)])
def test_winnow_membership_vs_bruteforce(seed, k, w, s):
    rng = np.random.default_rng(seed)
    seq = random_dna(rng, 400, n_prob=0.01)
    recs = winnow_minmers(seq, k, w, s)
    n = len(seq) - k + 1
    m = w - k + 1
    last_window = n - m

    got = {}
    for r in recs:
        got.setdefault(int(r["hash"]), set()).update(
            range(int(r["wpos"]), min(int(r["wpos_end"]), last_window + 1))
        )
    want = brute_window_membership(seq, k, w, s)
    want = {h: ws for h, ws in want.items() if ws}
    got = {h: ws for h, ws in got.items() if ws}
    assert got == want


def test_winnow_records_well_formed():
    rng = np.random.default_rng(42)
    seq = random_dna(rng, 1000)
    recs = winnow_minmers(seq, 15, 100, 10)
    assert len(recs) > 0
    assert np.all(recs["wpos_end"] > recs["wpos"])
    assert np.all(recs["wpos_end"] - recs["wpos"] <= 100)
    # sorted by (wpos, wpos_end)
    key = recs["wpos"] * 10**9 + recs["wpos_end"]
    assert np.all(np.diff(key) >= 0)
    # no consecutive (wpos, hash) duplicates
    dup = (recs["wpos"][1:] == recs["wpos"][:-1]) & (
        recs["hash"][1:] == recs["hash"][:-1]
    )
    assert not np.any(dup)


def test_streaming_minhash_sketch_oracle():
    """sketch_sequence_streaming vs a direct port of the reference heap
    semantics (commonFunc.hpp:338-427, streamingMinHash.hpp:89-99)."""
    import heapq

    import numpy as np

    from wfmash_tpu.sketch.kmers import canonical_kmer_hashes
    from wfmash_tpu.sketch.winnow import sketch_sequence_streaming

    rng = np.random.default_rng(3)
    seq = bytes(rng.choice(list(b"ACGTN"), 600, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
    k, s, w = 9, 24, 50
    pos, canon, _ = canonical_kmer_hashes(seq, k)

    # reference: max-heap of the s smallest occurrences (multiset)
    heap: list[int] = []
    first = {}
    for p, h in zip(pos.tolist(), canon.tolist()):
        if h not in first:
            first[h] = p
        if len(heap) < s:
            heapq.heappush(heap, -h)
        elif h < -heap[0]:
            heapq.heapreplace(heap, -h)
    expect = sorted(-x for x in heap)
    recs = sketch_sequence_streaming(seq, k, s, w, seq_id=7)
    assert sorted(recs["hash"].tolist()) == expect
    for r in recs:
        assert r["wpos"] == first[int(r["hash"])]
        assert r["wpos_end"] == r["wpos"] + w
        assert r["seq_id"] == 7 and r["strand"] == 1
    assert (np.diff(recs["wpos"]) >= 0).all()
