"""Test helpers: write indexed FASTA fixtures, mutate sequences."""

import numpy as np

COMP = {65: 84, 67: 71, 71: 67, 84: 65, 78: 78}


def write_fasta(path, seqs: dict):
    """Write an uncompressed FASTA + .fai index."""
    offsets = {}
    with open(path, "wb") as fh:
        for name, seq in seqs.items():
            fh.write(b">" + name.encode() + b"\n")
            offsets[name] = fh.tell()
            fh.write(bytes(seq) + b"\n")
    with open(str(path) + ".fai", "wt") as fh:
        for name, seq in seqs.items():
            fh.write(
                f"{name}\t{len(seq)}\t{offsets[name]}\t{len(seq)}\t{len(seq) + 1}\n"
            )


def random_dna(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))


def revcomp(seq: bytes) -> bytes:
    return bytes(COMP[b] for b in reversed(seq))


def mutate(rng, seq: bytes, rate: float) -> bytes:
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    pos = rng.random(len(arr)) < rate
    subs = rng.choice(list(b"ACGT"), size=int(pos.sum())).astype(np.uint8)
    arr[pos] = subs
    return bytes(arr)
