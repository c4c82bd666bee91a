"""Full pipeline (map + WFA align) end-to-end on synthetic genomes, with a
pafcheck-style validator: every CIGAR is replayed against the actual
sequences ('=' must match, 'X' must mismatch, coordinates must be
consistent with the PAF columns).
"""

import io
import os

import numpy as np
import pytest

# E2E tests exercise the full pipeline semantics with the host WFA engine
# (the device engine's exactness is covered by tests/test_wfa_jax.py; on the
# CPU test platform its sweeps are orders of magnitude slower).
os.environ["WFMASH_TPU_WFA_ENGINE"] = "host"

from wfmash_tpu.align import cigar as C
from wfmash_tpu.align.engine import run_alignment
from wfmash_tpu.io.paf import parse_paf_line
from wfmash_tpu.params import AlignParams, MapParams
from wfmash_tpu.runner import run_mapping
from wfmash_tpu.sketch.kmers import normalize, reverse_complement

from util import mutate, random_dna, revcomp, write_fasta


def run_full(tmp_path, target_seqs, query_seqs, **overrides):
    tfa = tmp_path / "target.fa"
    qfa = tmp_path / "query.fa"
    write_fasta(tfa, target_seqs)
    write_fasta(qfa, query_seqs)
    mp = MapParams(
        ref_sequences=[str(tfa)],
        query_sequences=[str(qfa)],
        percentage_identity=0.9,
        auto_pct_identity=False,
        **overrides,
    ).finalize()
    map_out = io.StringIO()
    run_mapping(mp, map_out)
    paf_path = tmp_path / "mappings.paf"
    paf_path.write_text(map_out.getvalue())

    ap = AlignParams(
        ref_sequences=[str(tfa)],
        query_sequences=[str(qfa)],
        mashmap_paf_file=str(paf_path),
        # small padding keeps test WFA scores bounded (default min(w,5000)
        # adds ~2*padding score per record via boundary deletion runs)
        target_padding=100,
        query_padding=100,
    ).finalize(mp.window_length)
    out = io.StringIO()
    run_alignment(ap, out)
    return [parse_paf_line(l) for l in out.getvalue().splitlines()], target_seqs, query_seqs


def validate_paf_row(row, targets, queries):
    """pafcheck-equivalent: replay cg:Z: against the sequences."""
    assert "cg" in row["tags"], "missing CIGAR"
    ops = C.parse(row["tags"]["cg"][1])
    t = bytes(normalize(targets[row["target_name"]]))
    q_fwd = bytes(normalize(queries[row["query_name"]]))
    if row["strand"] == "-":
        # PAF query coords are on the + strand; the alignment ran on the
        # reverse complement
        q = bytes(reverse_complement(np.frombuffer(q_fwd, dtype=np.uint8)))
        q_start = len(q_fwd) - row["query_end"]
    else:
        q = q_fwd
        q_start = row["query_start"]
    assert C.validate(ops, q, t, q_start, row["target_start"]), "CIGAR replay failed"
    # column consistency
    (matches, mismatches, ins, ins_bp, dels, del_bp, ref_len, q_len) = C.stats(ops)
    assert row["matches"] == matches
    assert row["target_end"] - row["target_start"] == ref_len
    assert row["query_end"] - row["query_start"] == q_len
    assert row["block_length"] == max(ref_len, q_len)
    gi = float(row["tags"]["gi"][1])
    assert gi == pytest.approx(matches / (matches + mismatches + ins + dels), abs=1e-5)


def test_full_pipeline_forward(tmp_path):
    rng = np.random.default_rng(0)
    target = random_dna(rng, 12_000)
    query = mutate(rng, target[3_000:10_000], 0.015)
    # scaffold filtering itself is covered in test_mapping_e2e
    rows, tseqs, qseqs = run_full(
        tmp_path, {"t1": target}, {"q1": query}, scaffold_gap=0
    )
    assert rows
    for r in rows:
        validate_paf_row(r, {"t1": target}, {"q1": query})
    # most of the query should be covered by alignments
    covered = np.zeros(len(query), dtype=bool)
    for r in rows:
        covered[r["query_start"]:r["query_end"]] = True
    assert covered.mean() > 0.9
    assert all(float(r["tags"]["gi"][1]) > 0.9 for r in rows)


def test_full_pipeline_reverse(tmp_path):
    rng = np.random.default_rng(1)
    target = random_dna(rng, 12_000)
    query = revcomp(mutate(rng, target[2_000:8_000], 0.012))
    rows, _, _ = run_full(tmp_path, {"t1": target}, {"q1": query}, scaffold_gap=0)
    assert rows
    assert all(r["strand"] == "-" for r in rows)
    for r in rows:
        validate_paf_row(r, {"t1": target}, {"q1": query})


def test_full_pipeline_with_indels(tmp_path):
    rng = np.random.default_rng(2)
    target = random_dna(rng, 14_000)
    # query: two segments of target with a 400bp deletion between them
    q = mutate(rng, target[3_000:7_000] + target[7_400:11_000], 0.012)
    rows, _, _ = run_full(tmp_path, {"t1": target}, {"q1": q}, scaffold_gap=0)
    assert rows
    for r in rows:
        validate_paf_row(r, {"t1": target}, {"q1": q})
    # the deletion should appear in some CIGAR as a ~400bp D
    all_cigars = " ".join(r["tags"]["cg"][1] for r in rows)
    has_big_del = any(
        op == "D" and n > 300 for n, op in C.parse(all_cigars.replace(" ", ""))
    )
    assert has_big_del


def test_sam_output(tmp_path):
    rng = np.random.default_rng(3)
    target = random_dna(rng, 11_000)
    query = mutate(rng, target[1_000:7_000], 0.012)
    tfa = tmp_path / "t.fa"
    qfa = tmp_path / "q.fa"
    write_fasta(tfa, {"t1": target})
    write_fasta(qfa, {"q1": query})
    mp = MapParams(
        ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
        percentage_identity=0.9, auto_pct_identity=False, scaffold_gap=0,
    ).finalize()
    buf = io.StringIO()
    run_mapping(mp, buf)
    paf_path = tmp_path / "m.paf"
    paf_path.write_text(buf.getvalue())
    ap = AlignParams(
        ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
        mashmap_paf_file=str(paf_path), sam_format=True, emit_md_tag=True,
        target_padding=100, query_padding=100,
    ).finalize(mp.window_length)
    out = io.StringIO()
    run_alignment(ap, out)
    lines = out.getvalue().splitlines()
    headers = [l for l in lines if l.startswith("@")]
    records = [l for l in lines if not l.startswith("@")]
    assert any(l.startswith("@SQ\tSN:t1\tLN:11000") for l in headers)
    assert records
    for rec in records:
        f = rec.split("\t")
        assert f[2] == "t1"
        assert int(f[3]) >= 1
        assert any(x.startswith("MD:Z:") for x in f)
        assert any(x.startswith("NM:i:") for x in f)


def test_overlong_mapping_row_clamps(tmp_path):
    """Merged-chain mapping rows can claim q_end beyond the query length
    (the reference emits them too; its faidx fetch clamps). The aligned
    row must stay inside the sequence and replay exactly."""
    import numpy as np

    from wfmash_tpu.align.engine import run_alignment
    from wfmash_tpu.params import AlignParams
    from wfmash_tpu.sketch.kmers import reverse_complement
    from util import random_dna, write_fasta

    rng = np.random.default_rng(41)
    t = random_dna(rng, 3000)
    q = bytes(reverse_complement(bytearray(t[400:2400])))  # 2000bp, rev
    tfa, qfa = tmp_path / "t.fa", tmp_path / "q.fa"
    write_fasta(tfa, {"tt": t})
    write_fasta(qfa, {"qq": q})
    # q_end 2300 > qlen 2000 (overlong), '-' strand
    paf = (f"qq\t2000\t0\t2300\t-\ttt\t3000\t400\t2400\t100\t2300\t60\t"
           f"id:f:0.99\tkc:f:1\n")
    mpaf = tmp_path / "m.paf"
    mpaf.write_text(paf)
    ap = AlignParams(ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
                     mashmap_paf_file=str(mpaf), target_padding=0,
                     query_padding=0)
    import io

    out = io.StringIO()
    run_alignment(ap, out)
    rows = out.getvalue().splitlines()
    assert rows
    f = rows[0].split("\t")
    assert int(f[3]) <= 2000 and int(f[2]) >= 0
    from wfmash_tpu.io.paf import parse_paf_line

    validate_paf_row(parse_paf_line(rows[0]), {"tt": t}, {"qq": q})


def test_threaded_align_identical(tmp_path):
    """-t 4 align (fork-pool patching + host leaves) must produce output
    byte-identical to -t 1."""
    import io

    import numpy as np

    from wfmash_tpu.align.engine import run_alignment
    from wfmash_tpu.params import AlignParams, MapParams
    from wfmash_tpu.runner import run_mapping
    from util import mutate, random_dna, write_fasta

    rng = np.random.default_rng(55)
    t = random_dna(rng, 30_000)
    queries = {f"q{i}": mutate(rng, t[i * 1_000:i * 1_000 + 12_000], 0.04)
               for i in range(6)}
    tfa, qfa = tmp_path / "t.fa", tmp_path / "q.fa"
    write_fasta(tfa, {"t1": t})
    write_fasta(qfa, queries)
    mp = MapParams(ref_sequences=[str(tfa)], query_sequences=[str(qfa)],
                   percentage_identity=0.9, auto_pct_identity=False,
                   threads=1).finalize()
    buf = io.StringIO()
    run_mapping(mp, buf)
    mpaf = tmp_path / "m.paf"
    mpaf.write_text(buf.getvalue())

    outs = []
    for nthreads in (1, 4):
        ap = AlignParams(ref_sequences=[str(tfa)],
                         query_sequences=[str(qfa)],
                         mashmap_paf_file=str(mpaf), threads=nthreads)
        out = io.StringIO()
        run_alignment(ap, out)
        outs.append(out.getvalue())
    assert outs[0] == outs[1]
    assert outs[0].strip()
