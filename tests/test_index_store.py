"""Index persistence: -W / -I round trip must reproduce identical output."""

import io

import numpy as np
import pytest

from wfmash_tpu.params import MapParams
from wfmash_tpu.runner import run_mapping

from util import mutate, random_dna, write_fasta


def test_index_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    t1 = random_dna(rng, 12_000)
    t2 = random_dna(rng, 9_000)
    q = mutate(rng, t1[1_000:9_000], 0.02)
    tfa = tmp_path / "t.fa"
    qfa = tmp_path / "q.fa"
    write_fasta(tfa, {"t1": t1, "t2": t2})
    write_fasta(qfa, {"q1": q})

    common = dict(
        ref_sequences=[str(tfa)],
        query_sequences=[str(qfa)],
        percentage_identity=0.9,
        auto_pct_identity=False,
        index_by_size=10_000,  # forces 2 subsets
        scaffold_gap=0,
    )

    # direct run
    direct = io.StringIO()
    run_mapping(MapParams(**common).finalize(), direct)

    # write index
    idx_path = tmp_path / "ref.idx"
    run_mapping(
        MapParams(
            **common, index_filename=str(idx_path), create_index_only=True
        ).finalize(),
        io.StringIO(),
    )
    assert idx_path.exists() and idx_path.stat().st_size > 0

    # read index
    loaded = io.StringIO()
    run_mapping(
        MapParams(**common, index_filename=str(idx_path)).finalize(), loaded
    )

    assert direct.getvalue() == loaded.getvalue()
    assert direct.getvalue().strip(), "expected mappings"


def test_index_rejects_mismatched_params(tmp_path):
    rng = np.random.default_rng(1)
    t1 = random_dna(rng, 8_000)
    tfa = tmp_path / "t.fa"
    qfa = tmp_path / "q.fa"
    write_fasta(tfa, {"t1": t1})
    write_fasta(qfa, {"q1": t1[:4_000]})
    common = dict(
        ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
        percentage_identity=0.9, auto_pct_identity=False,
    )
    idx_path = tmp_path / "ref.idx"
    run_mapping(
        MapParams(**common, index_filename=str(idx_path),
                  create_index_only=True).finalize(),
        io.StringIO(),
    )
    with pytest.raises(ValueError, match="do not match"):
        run_mapping(
            MapParams(**common, kmer_size=17,
                      index_filename=str(idx_path)).finalize(),
            io.StringIO(),
        )
