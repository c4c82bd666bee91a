"""Benchmark: the reference's headline workload, end to end, on TPU.

Runs `wfmash data/LPA.subset.fa.gz -p 80 -n 5 -t 8` — the de-facto
wfmash performance benchmark (doc/performance-tuning.md; best published
number 5.971 s wall on an 8-core AVX2 Ryzen 3700X, static+native
build) — through the full wfmash-tpu pipeline: host/native mapping +
anchored segmented alignment on the device segment kernel.

Protocol: mapping is timed directly; the align phase runs TWICE in
process and the SECOND run is timed. The first run absorbs the one-off
kernel compilations, which through the axon tunnel happen server-side
at first execution (30-400 s/program, LRU-cached per server — see
ARCHITECTURE.md); a deployment on local TPU hosts pays them once per
program lifetime via the persistent JAX cache. Reported value =
mapping wall + warm align wall; vs_baseline = 5.971 / value.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import io
import json
import os
import sys
import time


LPA = "/root/reference/data/LPA.subset.fa.gz"
BASELINE_WALL = 5.971    # s, reference static+native build, 8C Ryzen


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from wfmash_tpu.utils import jaxcache

    jaxcache.enable()
    from wfmash_tpu.align.engine import run_alignment
    from wfmash_tpu.params import AlignParams, MapParams
    from wfmash_tpu.runner import run_mapping

    threads = min(8, os.cpu_count() or 1)
    mp = MapParams(
        ref_sequences=[LPA], query_sequences=[LPA],
        percentage_identity=0.80, auto_pct_identity=False,
        num_mappings_for_segment=5, threads=threads,
    ).finalize()

    t0 = time.time()
    buf = io.StringIO()
    run_mapping(mp, buf)
    map_wall = time.time() - t0
    map_paf = "/tmp/wfmash-tpu-bench-map.paf"
    with open(map_paf, "w") as fh:
        fh.write(buf.getvalue())
    n_rows = buf.getvalue().count("\n")
    log(f"[bench] mapping: {n_rows} records in {map_wall:.2f}s")

    ap = AlignParams(
        ref_sequences=[LPA], query_sequences=[LPA],
        mashmap_paf_file=map_paf, threads=threads,
    )

    t0 = time.time()
    out1 = io.StringIO()
    run_alignment(ap, out1)
    log(f"[bench] align warm-up (incl. compiles): {time.time() - t0:.1f}s")

    t0 = time.time()
    out2 = io.StringIO()
    run_alignment(ap, out2)
    align_wall = time.time() - t0
    n_aligned = out2.getvalue().count("\n")
    log(f"[bench] align warm: {n_aligned} records in {align_wall:.2f}s")
    assert out1.getvalue() == out2.getvalue(), "non-deterministic output"
    assert n_aligned > 2000, "suspiciously few aligned records"

    try:
        os.unlink(map_paf)
    except OSError:
        pass

    value = map_wall + align_wall
    print(json.dumps({
        "metric": "lpa_allvsall_e2e_warm_wall",
        "value": round(value, 2),
        "unit": "s (map+align, lower is better)",
        "vs_baseline": round(BASELINE_WALL / value, 4),
    }))


if __name__ == "__main__":
    main()
