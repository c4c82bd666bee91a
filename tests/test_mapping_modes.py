"""Behavioral coverage for mapping selection/filter modes: one-to-one,
sparsification, lower-triangular, merge on/off, ANI auto-identity."""

import io

import numpy as np
import pytest

from wfmash_tpu.params import FILTER_ONETOONE, MapParams
from wfmash_tpu.runner import run_mapping

from util import mutate, random_dna, write_fasta


def _run(tmp_path, tseqs, qseqs, **overrides):
    tfa, qfa = tmp_path / "t.fa", tmp_path / "q.fa"
    write_fasta(tfa, tseqs)
    write_fasta(qfa, qseqs)
    mp = MapParams(
        ref_sequences=[str(tfa)],
        query_sequences=[str(qfa)],
        percentage_identity=0.85,
        auto_pct_identity=False,
        scaffold_gap=0,
        **overrides,
    ).finalize()
    out = io.StringIO()
    run_mapping(mp, out)
    return [l.split("\t") for l in out.getvalue().splitlines()]


def test_one_to_one_keeps_best_query_per_target(tmp_path):
    rng = np.random.default_rng(0)
    t = random_dna(rng, 30_000)
    q_good = t[2_000:22_000]                       # perfect copy
    q_bad = mutate(rng, t[2_000:22_000], 0.05)     # divergent copy
    rows_map = _run(tmp_path, {"t1": t},
                    {"good": q_good, "bad": q_bad},
                    num_mappings_for_segment=1)
    assert {r[0] for r in rows_map} == {"good", "bad"}
    rows_11 = _run(tmp_path, {"t1": t},
                   {"good": q_good, "bad": q_bad},
                   num_mappings_for_segment=1,
                   filter_mode=FILTER_ONETOONE)
    # the reference-axis sweep keeps only the best query over the region
    names = {r[0] for r in rows_11}
    assert "good" in names
    assert len(rows_11) < len(rows_map)


def test_sparsify_threshold(tmp_path):
    rng = np.random.default_rng(1)
    t = random_dna(rng, 60_000)
    q = mutate(rng, t, 0.01)
    full = _run(tmp_path, {"t1": t}, {"q1": q})
    U64 = 0xFFFFFFFFFFFFFFFF
    same = _run(tmp_path, {"t1": t}, {"q1": q}, sparsity_hash_threshold=U64)
    assert len(same) == len(full)
    sparse = _run(tmp_path, {"t1": t}, {"q1": q},
                  sparsity_hash_threshold=U64 // 16)
    assert len(sparse) < len(full)


def test_lower_triangular(tmp_path):
    rng = np.random.default_rng(2)
    a = random_dna(rng, 20_000)
    b = mutate(rng, a, 0.01)
    seqs = {"s1": a, "s2": b}
    both = _run(tmp_path, seqs, seqs, skip_self=True)
    pairs = {(r[0], r[5]) for r in both}
    assert ("s1", "s2") in pairs and ("s2", "s1") in pairs
    tri = _run(tmp_path, seqs, seqs, skip_self=True, lower_triangular=True)
    tri_pairs = {(r[0], r[5]) for r in tri}
    assert len(tri_pairs) == 1  # only one direction survives


def test_merge_off_emits_jc_tag(tmp_path):
    rng = np.random.default_rng(3)
    t = random_dna(rng, 20_000)
    q = mutate(rng, t[1_000:15_000], 0.01)
    merged = _run(tmp_path, {"t1": t}, {"q1": q})
    unmerged = _run(tmp_path, {"t1": t}, {"q1": q}, merge_mappings=False)
    assert any("ch:Z:" in c for r in merged for c in r)
    assert all(any(c == "jc:f:0" for c in r) for r in unmerged)
    assert len(unmerged) >= len(merged)


def test_ani_auto_identity(tmp_path):
    rng = np.random.default_rng(4)
    base = random_dna(rng, 120_000)
    seqs = {
        "g1#1#c": base,
        "g2#1#c": mutate(rng, base, 0.04),
    }
    fa = tmp_path / "all.fa"
    write_fasta(fa, seqs)
    mp = MapParams(
        ref_sequences=[str(fa)],
        query_sequences=[str(fa)],
        auto_pct_identity=True,
        ani_percentile=50,
    ).finalize()
    from wfmash_tpu.map.ani import estimate_identity_for_groups

    ani = estimate_identity_for_groups(mp)
    assert ani is not None
    # 4% substitution divergence -> ANI estimate in a plausible band
    assert 0.90 <= ani <= 0.99


def test_no_split_scaffold_interaction(tmp_path):
    """-N (no-split) with default scaffolding drops ALL mappings —
    matching the reference: mergeMappingsInRange returns unmerged on
    !param.split (mappingFilter.hpp:584), fragment-length chains never
    reach scaffold_min_length, and empty anchors clear readMappings
    (mappingFilter.hpp:905-908). With scaffolding off (-j 0), no-split
    emits per-fragment rows."""
    import io

    import numpy as np

    from wfmash_tpu.params import MapParams
    from wfmash_tpu.runner import run_mapping
    from util import mutate, random_dna, write_fasta

    rng = np.random.default_rng(71)
    base = random_dna(rng, 30000)
    tfa, qfa = tmp_path / "t.fa", tmp_path / "q.fa"
    write_fasta(tfa, {"t1": base})
    write_fasta(qfa, {"q1": mutate(rng, base, 0.02)})
    common = dict(ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
                  percentage_identity=0.85, auto_pct_identity=False,
                  split=False)
    buf = io.StringIO()
    run_mapping(MapParams(**common).finalize(), buf)
    assert buf.getvalue() == "", "reference parity: -N + scaffolds = empty"
    buf = io.StringIO()
    run_mapping(MapParams(**common, scaffold_gap=0).finalize(), buf)
    assert buf.getvalue().count("\n") > 0
