"""pafcheck-style validation of a PAF against its FASTAs.

Replays every cg:Z: CIGAR against the actual sequences (match ops must
match, mismatch ops must differ — the same check the reference's CI
runs via the external `pafcheck` tool, CMakeLists.txt:451-454) and
cross-checks the coordinate/match-count columns.

Usage: validate_paf.py aln.paf target.fa query.fa
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
from wfmash_tpu.align import cigar as C
from wfmash_tpu.sketch.kmers import normalize, reverse_complement
from wfmash_tpu.io.fasta import FastaReader


def load(fn):
    r = FastaReader(fn)
    return {n: r.fetch(n, 0, r.seq_len(n) - 1) for n in r.names}


def parse_tags(fields):
    tags = {}
    for f in fields:
        if not f:
            continue
        k, typ, v = f.split(":", 2)
        tags[k] = (typ, v)
    return tags


def main(paf, tfa, qfa):
    targets = load(tfa)
    queries = load(qfa)
    n = 0
    gi_sum = 0.0
    aligned_bp = 0
    for line in open(paf):
        f = line.rstrip("\n").split("\t")
        (qn, qlen, qs, qe, strand, tn, tlen, ts, te) = (
            f[0], int(f[1]), int(f[2]), int(f[3]), f[4], f[5], int(f[6]),
            int(f[7]), int(f[8]))
        matches, blk = int(f[9]), int(f[10])
        tags = parse_tags(f[12:])
        ops = C.parse(tags["cg"][1])
        t = bytes(normalize(np.frombuffer(targets[tn], np.uint8)))
        q_fwd = bytes(normalize(np.frombuffer(queries[qn], np.uint8)))
        if strand == "-":
            q = bytes(reverse_complement(np.frombuffer(q_fwd, np.uint8)))
            q_start = len(q_fwd) - qe
        else:
            q, q_start = q_fwd, qs
        assert C.validate(ops, q, t, q_start, ts), f"CIGAR replay failed: {f[:9]}"
        m, mm, ins, ins_bp, dels, del_bp, ref_len, q_len = C.stats(ops)
        assert te - ts == ref_len and qe - qs == q_len, "span mismatch"
        assert matches == m, "match count mismatch"
        gi_sum += float(tags["gi"][1])
        aligned_bp += q_len
        n += 1
    print(f"OK: {n} records validated; mean gi={gi_sum/max(n,1):.4f}; "
          f"aligned query bp={aligned_bp}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
