"""MurmurHash3_x64_128 low-64 bit-exactness tests.

The scalar pure-Python implementation is the transcription of the public
murmur3 spec; the NumPy and JAX(u32-pair) implementations must agree with
it bit-for-bit for every key length used by the pipeline.
"""

import numpy as np
import pytest

from wfmash_tpu.sketch.murmur import (
    murmur3_low64_scalar,
    murmur3_x64_128_low64,
)


# Known-answer vectors for MurmurHash3_x64_128 (low 64 bits, little-endian
# h1), computed from the canonical public-domain C implementation.
KNOWN = [
    (b"", 0, 0x0000000000000000),
    (b"a", 0, 0x85555565F6597889),
    (b"ab", 0, 0x938B11EA16ED1B2E),
    (b"abc", 0, 0xB4963F3F3FAD7867),
    (b"abcd", 0, 0xB87BB7D64656CD4F),
    (b"Hello, world!", 0, 0xF1512DD1D2D665DF),
    (b"Hello, world!", 123, 0x421C8C738743ACAD),
    (b"The quick brown fox jumps over the lazy dog", 0, 0xE34BBC7BBC071B6C),
    (b"ACGTACGTACGTACG", 42, 0x456B3E2E10C981C6),
]

# Length series at seed 42: key[j] = (j*37 + L*101 + 13) & 0xFF.
KNOWN_LENGTH_SERIES = {
    1: 0x795E3D73513C88F5, 2: 0x5F7B8DB0733C3033, 3: 0xE801EF62E43AF680,
    4: 0x7CEC9B04FF7448EF, 5: 0x49E19A53909A6447, 6: 0xE621D8812E871AC0,
    7: 0x657B85C7E6246E8E, 8: 0xBAAA1C15DC2990B4, 9: 0x74360917F867F9B3,
    10: 0x8D671B416CEE5B01, 11: 0xD24A309B5E12F705, 12: 0xAD73D5B768F9A883,
    13: 0x679D9EF00D7C348F, 14: 0x4047564BA36C9631, 15: 0x824DC7BB3AF71950,
    16: 0xEFAD220C826C13CA, 17: 0xA788E3E534E2026E, 18: 0x8DC6E542DD40FA15,
    19: 0x49302743D8820C9B, 20: 0x6A9F9D4FAC7230D9, 21: 0x5420655C01A67E7B,
    22: 0xEB9B5A0C067CB9DD, 23: 0xF4298E39FAC290E4, 24: 0x195594072A20C2C3,
    25: 0x31167C0EDC6B7110, 26: 0x66EE7147C77F36DA, 27: 0x920B8B4A89DEBE77,
    28: 0x0764398555058D1F, 29: 0x682FFF52EEEDE2A5, 30: 0x7B8898349415452E,
    31: 0xC1EABC7475B04998, 32: 0xDEA4D4598F49B128, 33: 0xB5405FFD7AC555B0,
    34: 0x7C9D2B45631CCFD4, 35: 0x0FCB64D620EE8743,
}


@pytest.mark.parametrize("length", sorted(KNOWN_LENGTH_SERIES))
def test_scalar_length_series(length):
    key = bytes((j * 37 + length * 101 + 13) & 0xFF for j in range(length))
    assert murmur3_low64_scalar(key, 42) == KNOWN_LENGTH_SERIES[length]


@pytest.mark.parametrize("key,seed,expected", KNOWN)
def test_scalar_known_vectors(key, seed, expected):
    assert murmur3_low64_scalar(key, seed) == expected


@pytest.mark.parametrize("length", list(range(1, 36)))
def test_numpy_matches_scalar(length):
    rng = np.random.default_rng(length)
    keys = rng.integers(0, 256, size=(64, length), dtype=np.uint8)
    got = murmur3_x64_128_low64(keys, seed=42)
    want = np.array(
        [murmur3_low64_scalar(bytes(k), 42) for k in keys], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("length", [1, 7, 8, 9, 15, 16, 17, 19, 21, 28, 31, 32])
def test_jax_u32_matches_scalar(length):
    from wfmash_tpu.ops import u64
    from wfmash_tpu.ops.murmur_u32 import murmur3_low64

    rng = np.random.default_rng(1000 + length)
    keys = rng.integers(0, 256, size=(33, length), dtype=np.uint8)
    got = u64.to_numpy(murmur3_low64(keys, length, seed=42))
    want = np.array(
        [murmur3_low64_scalar(bytes(k), 42) for k in keys], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


def test_dna_kmer_hash_examples():
    # k=15 DNA k-mer, seed 42 — the exact configuration wfmash uses.
    h = murmur3_low64_scalar(b"ACGTACGTACGTACG", 42)
    assert h == murmur3_x64_128_low64(
        np.frombuffer(b"ACGTACGTACGTACG", dtype=np.uint8)
    )[0]
