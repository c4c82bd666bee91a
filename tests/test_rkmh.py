"""rkmh sketch + mash distance (rkmh.cpp:45-140 semantics)."""

import math

import numpy as np

from wfmash_tpu.align.rkmh import compare, hash_sequence
from wfmash_tpu.sketch.murmur import murmur3_low64_scalar

from util import mutate, random_dna


def brute_sketch(seq: bytes, k: int, s: int):
    """Direct port of the reference loop for cross-checking."""
    n = len(seq) - k                      # last k-mer dropped upstream
    hs = []
    for i in range(n):
        km = seq[i:i + k]
        if all(c in b"ACGT" for c in km):
            hs.append(murmur3_low64_scalar(km))
        else:
            hs.append(2**64 - 1)
    hs.sort()
    hs = hs[:s]
    return np.array([h for h in hs if h != 2**64 - 1], dtype=np.uint64)


def test_hash_sequence_matches_brute():
    rng = np.random.default_rng(0)
    seq = bytearray(random_dna(rng, 400))
    seq[37] = ord("N")
    seq[200] = ord("n")  # non-canonical lowercase too
    seq = bytes(seq)
    for k, s in ((16, 64), (8, 1000)):
        got = hash_sequence(seq, k, s)
        want = brute_sketch(seq, k, s)
        np.testing.assert_array_equal(got, want)


def test_compare_distances():
    rng = np.random.default_rng(1)
    a = random_dna(rng, 2000)
    k, s = 16, 128
    sa = hash_sequence(a, k, s)
    assert compare(sa, sa, k) == 0.0
    b = random_dna(rng, 2000)
    assert compare(sa, hash_sequence(b, k, s), k) == 1.0
    # mutated copy: distance approximates the divergence
    for div in (0.01, 0.05):
        c = mutate(rng, a, div)
        d = compare(sa, hash_sequence(c, k, s), k)
        assert 0.0 < d < 0.3
        assert abs(d - div) < div * 2 + 0.01


def test_compare_formula():
    # engineered sketches: verify the exact -log(2c/(d+c))/k formula
    alpha = np.array([1, 2, 3, 4], dtype=np.uint64)
    beta = np.array([3, 4, 5, 6], dtype=np.uint64)
    k = 16
    c, d = 2, 6
    want = -math.log(2.0 * c / (d + c)) / k
    assert compare(alpha, beta, k) == min(want, 1.0)
