"""Golden-data regression: the bundled 255bp reads reproduce the
reference's regression pairs (test/data/regression/reads.255bps.paf).

The golden file was produced by the reference binary; its exact flags
are unrecorded, so this checks structural parity — the same four read
pairs map, on the same strands, covering (nearly) the same spans — with
scaffold filtering off (tiny reads cannot form >=10 kb scaffold chains;
the reference clears all mappings in that case too,
mappingFilter.hpp:904-909).
"""

import io
import os

import pytest

from wfmash_tpu.params import MapParams
from wfmash_tpu.runner import run_mapping

DATA = "/root/reference/data/reads.255bps.fa.gz"
GOLDEN = "/root/reference/test/data/regression/reads.255bps.paf"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(DATA) and os.path.exists(GOLDEN)),
    reason="reference data not available")


def test_reads_255bps_pairs_match_golden():
    mp = MapParams(
        ref_sequences=[DATA],
        query_sequences=[DATA],
        percentage_identity=0.70,
        auto_pct_identity=False,
        window_length=200,
        kmer_size=15,
        scaffold_gap=0,
    ).finalize()
    out = io.StringIO()
    run_mapping(mp, out)
    ours = set()
    for line in out.getvalue().splitlines():
        f = line.split("\t")
        # primary span only (>=150bp) — tail-fragment echoes are shorter
        if int(f[3]) - int(f[2]) >= 150:
            ours.add((f[0], f[5], f[4]))
    golden = set()
    for line in open(GOLDEN):
        f = line.split("\t")
        golden.add((f[0], f[5], f[4]))
    # golden lists each pair once (one direction); we map all-vs-all so
    # require each golden pair to appear in at least one direction
    for q, t, strand in golden:
        assert ((q, t, strand) in ours) or ((t, q, strand) in ours), (
            f"golden pair {q} vs {t} ({strand}) not found")
