"""CLI flag-surface tests: parsing parity with the reference defaults."""

import numpy as np
import pytest

from wfmash_tpu.cli import parse_args
from wfmash_tpu.params import FILTER_MAP, FILTER_NONE, FILTER_ONETOONE

from util import random_dna, write_fasta


@pytest.fixture()
def fastas(tmp_path):
    rng = np.random.default_rng(0)
    t = tmp_path / "t.fa"
    q = tmp_path / "q.fa"
    write_fasta(t, {"t1": random_dna(rng, 3000)})
    write_fasta(q, {"q1": random_dna(rng, 2000)})
    return str(t), str(q)


def test_defaults(fastas):
    t, q = fastas
    mp, ap, approx, remap = parse_args([t, q, "-m"])
    assert mp.kmer_size == 15
    assert mp.window_length == 1000
    assert mp.chain_gap == 2000
    assert mp.max_mapping_length == 50000
    assert mp.block_length == 0
    assert mp.num_mappings_for_segment == 0xFFFFFFFF  # inf
    assert mp.num_mappings_for_scaffold == 1
    assert mp.scaffold_gap == 100000
    assert mp.scaffold_max_deviation == 100000
    assert mp.scaffold_min_length == 10000
    assert mp.overlap_threshold == 0.95
    assert mp.minimum_hits == 3
    assert mp.max_kmer_freq == 0.0002
    assert mp.skip_self and mp.skip_prefix and mp.prefix_delim == "#"
    assert mp.auto_pct_identity and mp.ani_percentile == 50
    assert mp.ani_adjustment == -2.0
    assert mp.filter_mode == FILTER_MAP
    assert approx and not remap
    # derived sketch size: dens = 0.02*(1 + md/0.1), md = 0.30
    assert mp.sketch_size == int(0.02 * (1 + 0.3 / 0.1) * (1000 - 15))
    # alignment side
    assert (ap.wfa_patching_mismatch_score,
            ap.wfa_patching_gap_opening_score1,
            ap.wfa_patching_gap_extension_score1,
            ap.wfa_patching_gap_opening_score2,
            ap.wfa_patching_gap_extension_score2) == (5, 8, 2, 24, 1)
    assert ap.target_padding == 1000 and ap.query_padding == 1000
    assert ap.wflign_max_len_major == 1000 * 512
    assert ap.min_alignment_length == 32
    assert ap.min_block_identity == 0.1


def test_units_and_presets(fastas):
    t, q = fastas
    mp, ap, *_ = parse_args(
        [t, q, "-m", "-w", "2k", "-c", "1k", "-P", "100k", "-p", "ani25+5",
         "-S", "5k", "-j", "50k", "-D", "20k", "-n", "7", "-s", "100"]
    )
    assert mp.window_length == 2000
    assert mp.chain_gap == 1000
    assert mp.max_mapping_length == 100000
    assert mp.ani_percentile == 25 and mp.ani_adjustment == 5.0
    assert mp.scaffold_min_length == 5000
    assert mp.scaffold_gap == 50000
    assert mp.scaffold_max_deviation == 20000
    assert mp.num_mappings_for_segment == 7
    assert mp.sketch_size == 100 and mp.sketch_size_manually_set


def test_filter_modes(fastas):
    t, q = fastas
    assert parse_args([t, q, "-m", "-f"])[0].filter_mode == FILTER_NONE
    assert parse_args([t, q, "-m", "-o"])[0].filter_mode == FILTER_ONETOONE


def test_explicit_identity(fastas):
    t, q = fastas
    mp, *_ = parse_args([t, q, "-m", "-p", "85"])
    assert not mp.auto_pct_identity
    assert mp.percentage_identity == pytest.approx(0.85)


def test_validation_errors(fastas):
    t, q = fastas
    with pytest.raises(SystemExit):
        parse_args([t, q, "-m", "-w", "50"])  # < 100
    with pytest.raises(SystemExit):
        parse_args([t, q, "-w", "20k"])  # > 10k with alignment
    with pytest.raises(SystemExit):
        parse_args([t, q, "-m", "-p", "30"])  # < 50%
    with pytest.raises(SystemExit):
        parse_args([t, q, "-l", "50k"])  # block length > 30k with alignment


def test_group_prefix_flag(fastas):
    t, q = fastas
    mp, *_ = parse_args([t, q, "-m", "-Y", ""])
    assert not mp.skip_prefix
    mp, *_ = parse_args([t, q, "-m", "-X"])
    assert not mp.skip_self


def test_hg_filter(fastas):
    t, q = fastas
    mp, *_ = parse_args([t, q, "-m", "--hg-filter", "2.0,5,99"])
    assert mp.hg_numerator == 2.0
    assert mp.ANIDiff == pytest.approx(0.05)
    assert mp.ANIDiffConf == pytest.approx(0.99)


def test_all_vs_all_default_query(fastas):
    t, _ = fastas
    mp, *_ = parse_args([t, "-m"])
    assert mp.query_sequences == [t]


def test_path_patching_tsv(tmp_path):
    """--path-patching-tsv writes one row per attempted boundary patch
    (reference: parse_args.hpp:146, WFA_PNG_TSV_TIMING debug option)."""
    import io

    import numpy as np

    from wfmash_tpu.align.engine import run_alignment
    from wfmash_tpu.params import AlignParams, MapParams
    from wfmash_tpu.runner import run_mapping
    from util import mutate, random_dna, write_fasta

    rng = np.random.default_rng(5)
    base = random_dna(rng, 9000)
    # heavily divergent flanks force head/tail erosion + patching
    q = (mutate(rng, base[:400], 0.15) + mutate(rng, base[400:8600], 0.02)
         + mutate(rng, base[8600:], 0.15))
    tfa, qfa = tmp_path / "t.fa", tmp_path / "q.fa"
    write_fasta(tfa, {"t1": base})
    write_fasta(qfa, {"q1": q})
    mp = MapParams(ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
                   percentage_identity=0.8, scaffold_gap=0,
                   auto_pct_identity=False).finalize()
    buf = io.StringIO()
    run_mapping(mp, buf)
    assert buf.getvalue().strip(), "fixture produced no mappings"
    paf = tmp_path / "m.paf"
    paf.write_text(buf.getvalue())
    tsv = tmp_path / "patch.tsv"
    ap = AlignParams(ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
                     mashmap_paf_file=str(paf),
                     path_patching_tsv=str(tsv)).finalize(mp.window_length)
    out = io.StringIO()
    run_alignment(ap, out)
    lines = tsv.read_text().splitlines()
    assert lines[0].startswith("query.name\tquery.start")
    assert len(lines) >= 2          # at least one patch attempted
    for row in lines[1:]:
        f = row.split("\t")
        assert len(f) == 10
        assert f[6] in ("head", "tail")
        assert f[9] in ("0", "1")


def test_wavefront_debug_dumps(tmp_path):
    """-G/-u/-z write per-alignment segmentation-plan TSVs and PNGs
    (reference debug flags parse_args.hpp:142-145, adapted to the
    anchor-chain plan — see align/debugplot.py)."""
    import io

    import numpy as np

    from wfmash_tpu.align.engine import run_alignment
    from wfmash_tpu.params import AlignParams, MapParams
    from wfmash_tpu.runner import run_mapping
    from util import mutate, random_dna, write_fasta

    rng = np.random.default_rng(7)
    base = random_dna(rng, 9000)
    tfa, qfa = tmp_path / "t.fa", tmp_path / "q.fa"
    write_fasta(tfa, {"t1": base})
    write_fasta(qfa, {"q1": mutate(rng, base, 0.03)})
    mp = MapParams(ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
                   percentage_identity=0.8, scaffold_gap=0,
                   auto_pct_identity=False).finalize()
    buf = io.StringIO()
    run_mapping(mp, buf)
    assert buf.getvalue().strip()
    paf = tmp_path / "m.paf"
    paf.write_text(buf.getvalue())
    ap = AlignParams(
        ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
        mashmap_paf_file=str(paf),
        wavefront_tsv_prefix=str(tmp_path / "wf_"),
        wavefront_png_prefix=str(tmp_path / "wf_"),
        wfplot_max_size=500).finalize(mp.window_length)
    out = io.StringIO()
    run_alignment(ap, out)
    tsvs = sorted(tmp_path.glob("wf_*.tsv"))
    pngs = sorted(tmp_path.glob("wf_*.png"))
    assert tsvs and pngs and len(tsvs) == len(pngs)
    body = tsvs[0].read_text().splitlines()
    assert body[0].startswith("# query_name=")
    assert "v\th\tinfo" in body
    data = [l for l in body if l and not l.startswith(("#", "v"))]
    assert all(l.split("\t")[2] in "012" for l in data)
    raw = pngs[0].read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
