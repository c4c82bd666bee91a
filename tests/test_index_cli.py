"""Multi-subset index via the CLI: -b splits targets into subsets, -W
persists each subset, -I streams them back; mapping output must be
identical to the direct run (reference test wfmash-multi-subset-index,
CMakeLists.txt:461-464)."""

import gzip
import io
import os
import sys

import pytest

DATA = "/root/reference/data/LPA.subset.fa.gz"

pytestmark = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference data not available")


def _two_seqs(tmp_path):
    fa = tmp_path / "lpa2.fa"
    kept = 0
    with gzip.open(DATA, "rt") as src, open(fa, "w") as dst:
        for line in src:
            if line.startswith(">"):
                kept += 1
                if kept > 2:
                    break
            dst.write(line)
    # .fai
    recs, pos2 = [], 0
    for line in open(fa, "rb").read().split(b"\n"):
        ll = len(line) + 1
        if line.startswith(b">"):
            recs.append([line[1:].split()[0].decode(), 0, pos2 + ll, None,
                         None])
        elif line and recs:
            r = recs[-1]
            if r[3] is None:
                r[3], r[4] = len(line), ll
            r[1] += len(line)
        pos2 += ll
    with open(str(fa) + ".fai", "w") as fh:
        for r in recs:
            fh.write("\t".join(map(str, r)) + "\n")
    return str(fa)


def _run_cli(args):
    from wfmash_tpu import cli

    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        rc = cli.main(args)
    finally:
        sys.stdout = stdout
    assert rc == 0
    return buf.getvalue()


def test_multi_subset_index_cli(tmp_path):
    fa = _two_seqs(tmp_path)
    idx = str(tmp_path / "lpa.idx")
    common = [fa, "-m", "-p", "80", "-n", "5", "-b", "300k", "-t", "1"]
    direct = _run_cli(common)
    assert direct.strip(), "direct mapping produced no output"
    _run_cli(common + ["-W", idx])
    assert os.path.getsize(idx) > 0
    from_index = _run_cli(common + ["-I", idx])
    assert from_index == direct
