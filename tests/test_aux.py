"""Auxiliary subsystems: temp registry, progress meter, cluster scripts."""

import io
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tempfile_registry(tmp_path):
    from wfmash_tpu.utils import tempfiles

    tempfiles.set_dir(str(tmp_path))
    tempfiles.set_keep_temp(False)
    p = tempfiles.create(".paf")
    assert os.path.exists(p)
    assert os.path.dirname(p) == str(tmp_path)
    assert os.path.basename(p).startswith("wfmash-tpu-")
    tempfiles._cleanup()
    assert not os.path.exists(p)
    # -Z keeps files
    tempfiles.set_keep_temp(True)
    p2 = tempfiles.create(".paf")
    tempfiles._cleanup()
    assert os.path.exists(p2)
    tempfiles.set_keep_temp(False)
    tempfiles.set_dir(None)
    os.unlink(p2)


def test_progress_meter(capsys):
    from wfmash_tpu.utils.progress import ProgressMeter

    m = ProgressMeter(100, "[test] phase", heartbeat_s=0.05)
    m.increment(50)
    import time

    time.sleep(0.15)
    m.increment(50)
    m.finish()
    err = capsys.readouterr().err
    assert "[test] phase" in err
    assert "done in" in err


def _write_paf(path, rows):
    with open(path, "w") as fh:
        for (qs, qe, ts, te, ident) in rows:
            fh.write(
                f"q\t10000\t{qs}\t{qe}\t+\tt\t10000\t{ts}\t{te}\t"
                f"50\t{qe - qs}\t60\tid:f:{ident}\tkc:f:0.5\n")


def test_split_mappings_balanced(tmp_path):
    paf = tmp_path / "m.paf"
    rows = [(0, 8000, 0, 8000, 80.0),     # heavy: long + divergent
            (0, 1000, 0, 1000, 99.0),
            (0, 4000, 0, 4000, 95.0),
            (0, 500, 0, 500, 90.0)]
    _write_paf(paf, rows)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "split_approx_mappings_in_chunks.py"),
         str(paf), "2"], check=True)
    c0 = (tmp_path / "m.paf.chunk_0.paf").read_text().splitlines()
    c1 = (tmp_path / "m.paf.chunk_1.paf").read_text().splitlines()
    assert len(c0) + len(c1) == 4
    # the heavy mapping (8000bp @ 80%) must sit alone in its chunk
    heavy = [c for c in (c0, c1) if any("\t8000\t" in l for l in c)]
    assert len(heavy[0]) == 1


def test_all2all_jobs(tmp_path):
    fa = tmp_path / "p.fa"
    fa.write_text(">x\nA\n")
    with open(str(fa) + ".fai", "w") as fh:
        for name in ("s1#1#c1", "s1#1#c2", "s2#1#c1", "s3#1#c1"):
            fh.write(f"{name}\t100\t10\t60\t61\n")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "all2all_jobs.py"),
         str(fa), "-n", "2", "-t", "h", "-q", "h", "--", "-p", "90"],
        check=True, capture_output=True, text=True)
    lines = res.stdout.splitlines()
    # 3 haplotype groups, each vs the other 2 (batched 2 per job) = 3 jobs
    assert len(lines) == 3
    assert all("python -m wfmash_tpu" in l and "-p 90" in l for l in lines)
    assert any("-T s1#1" in l and "-Q s2#1,s3#1" in l for l in lines)
