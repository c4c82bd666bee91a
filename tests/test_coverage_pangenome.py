"""Pangenome all-vs-all coverage acceptance test.

Port of the reference's yeast coverage test (scripts/test.sh +
CMakeLists.txt:446-449): after all-vs-all mapping with PanSN group
exclusion, the union of query- and target-side mapped intervals must
cover >= 89% of every sequence. The bundled scerevisiae8.fa.gz is
absent from this checkout (.MISSING_LARGE_BLOBS), so an 8-haplotype
synthetic pangenome (shared ancestor, 1-5% divergence, structural
shuffles) stands in; the bedtools interval arithmetic is reimplemented
in numpy.
"""

import io

import numpy as np
import pytest

from wfmash_tpu.params import MapParams
from wfmash_tpu.runner import run_mapping

from util import mutate, random_dna, write_fasta


def interval_coverage(intervals: list[tuple[int, int]], length: int) -> float:
    """bedtools merge + total covered bp / length."""
    if not intervals:
        return 0.0
    iv = sorted(intervals)
    covered = 0
    cs, ce = iv[0]
    for s, e in iv[1:]:
        if s > ce:
            covered += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    covered += ce - cs
    return covered / length


def test_pangenome_allvsall_coverage(tmp_path):
    rng = np.random.default_rng(7)
    ancestor = random_dna(rng, 60_000)
    seqs = {}
    for hap in range(8):
        div = 0.01 + 0.005 * hap
        s = mutate(rng, ancestor, div)
        if hap % 3 == 2:
            # structural shuffle: swap two large chunks
            a = np.frombuffer(s, np.uint8).copy()
            a = np.concatenate([a[30_000:], a[:30_000]])
            s = a.tobytes()
        seqs[f"g{hap}#1#chr1"] = s
    fa = tmp_path / "pan.fa"
    write_fasta(fa, seqs)
    mp = MapParams(
        ref_sequences=[str(fa)],
        query_sequences=[str(fa)],
        percentage_identity=0.95,
        auto_pct_identity=False,
        num_mappings_for_segment=7,
        skip_self=True,
        skip_prefix=True,
        prefix_delim="#",
        lower_triangular=True,
    ).finalize()
    out = io.StringIO()
    run_mapping(mp, out)
    rows = [l.split("\t") for l in out.getvalue().splitlines()]
    assert rows, "no mappings produced"

    lens = {n: len(s) for n, s in seqs.items()}
    per_seq: dict[str, list[tuple[int, int]]] = {n: [] for n in seqs}
    for r in rows:
        per_seq[r[0]].append((int(r[2]), int(r[3])))     # query side
        per_seq[r[5]].append((int(r[7]), int(r[8])))     # target side
    for name, iv in per_seq.items():
        cov = interval_coverage(iv, lens[name])
        assert cov >= 0.89, f"{name} covered only {cov:.3f}"
