"""External PAF seeds (-K): filter pipeline + annotated output
(externalSeeder.hpp:46-512)."""

import io

import numpy as np
import pytest

from wfmash_tpu.map.external import process_external_seeds
from wfmash_tpu.params import MapParams

from util import random_dna, write_fasta


def _setup(tmp_path, scaffold_gap):
    rng = np.random.default_rng(0)
    target = random_dna(rng, 60_000)
    query = target[5_000:45_000]
    tfa, qfa = tmp_path / "t.fa", tmp_path / "q.fa"
    write_fasta(tfa, {"t1": target})
    write_fasta(qfa, {"q1": query})

    # seeds: a colinear run of 1kb mappings (will scaffold) + one far
    # off-diagonal outlier (will be dropped by the scaffold filter)
    seeds = tmp_path / "seeds.paf"
    with open(seeds, "w") as fh:
        for i in range(0, 40_000 - 1000, 1000):
            fh.write(
                f"q1\t40000\t{i}\t{i + 1000}\t+\tt1\t60000\t{5000 + i}\t"
                f"{6000 + i}\t50\t1000\t60\tid:f:99.0\tcg:Z:1000=\n")
        fh.write("q1\t40000\t100\t1100\t+\tt1\t60000\t55000\t56000\t"
                 "50\t1000\t60\tid:f:99.0\n")

    mp = MapParams(
        ref_sequences=[str(tfa)],
        query_sequences=[str(qfa)],
        percentage_identity=0.9,
        auto_pct_identity=False,
        external_seeds_file=str(seeds),
        use_external_seeds=True,
        scaffold_gap=scaffold_gap,
        scaffold_min_length=5_000,
        scaffold_max_deviation=2_000,
    ).finalize()
    out = io.StringIO()
    process_external_seeds(mp, out)
    return out.getvalue().splitlines()


def test_external_seeds_scaffold_annotations(tmp_path):
    rows = _setup(tmp_path, scaffold_gap=10_000)
    assert rows
    tags = [dict(t.split(":", 2)[::2] for t in r.split("\t")[12:] if t)
            for r in rows]
    # scaffold filtering ran -> every row is annotated
    assert all("st" in t for t in tags)
    assert all(t["st"] in ("scaffold", "rescued") for t in tags)
    assert any(t["st"] == "scaffold" for t in tags)
    # the off-diagonal outlier did not survive
    assert not any("\t55000\t56000\t" in r for r in rows)
    # chain tags present (merge on by default)
    assert all("ch" in t for t in tags)


def test_external_seeds_no_scaffold(tmp_path):
    rows = _setup(tmp_path, scaffold_gap=0)
    assert rows
    assert all("st:Z:" not in r for r in rows)


def test_external_seeds_cigar_reattached(tmp_path):
    # with merging off, surviving mappings keep their original coords and
    # the seed CIGAR is re-attached
    rng = np.random.default_rng(1)
    target = random_dna(rng, 30_000)
    tfa, qfa = tmp_path / "t.fa", tmp_path / "q.fa"
    write_fasta(tfa, {"t1": target})
    write_fasta(qfa, {"q1": target[2_000:12_000]})
    seeds = tmp_path / "seeds.paf"
    with open(seeds, "w") as fh:
        fh.write("q1\t10000\t0\t10000\t+\tt1\t30000\t2000\t12000\t"
                 "500\t10000\t60\tid:f:99.0\tcg:Z:10000=\n")
    mp = MapParams(
        ref_sequences=[str(tfa)],
        query_sequences=[str(qfa)],
        percentage_identity=0.9,
        auto_pct_identity=False,
        external_seeds_file=str(seeds),
        use_external_seeds=True,
        merge_mappings=False,
        scaffold_gap=0,
    ).finalize()
    out = io.StringIO()
    process_external_seeds(mp, out)
    rows = out.getvalue().splitlines()
    assert len(rows) == 1
    assert "cg:Z:10000=" in rows[0]
