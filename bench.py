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
program lifetime via the persistent JAX cache.

Prints the round perf TRIO as three JSON lines (VERDICT round-2 #2),
headline last:
  1. wfa_sweep_throughput      — exact-engine Pallas sweep Gcells/s
  2. align_device_busy_fraction — device wall / align wall on the warm
     E2E pass (device time = forced D2H completion around every kernel
     batch, the only reliable completion point through the tunnel)
  3. lpa_allvsall_e2e_warm_wall — map wall + warm align wall (headline;
     vs_baseline = 5.971 / value)
"""

import io
import json
import os
import sys
import time

import numpy as np


LPA = "/root/reference/data/LPA.subset.fa.gz"
BASELINE_WALL = 5.971    # s, reference static+native build, 8C Ryzen
BASELINE_USER = 42.3     # s user on those 8 cores (same run)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_sweep() -> None:
    """Round-1 metric, kept for the trend line: exact-engine wavefront
    sweep throughput (64 x ~16 kb @ 5% divergence, K=512)."""
    from wfmash_tpu.align.wfa_np import Penalties
    from wfmash_tpu.align.wfa_pallas import NEG_I, UNSET32, PallasSweeps

    p = Penalties(5, 8, 2, 24, 1)
    B, K, L = 64, 512, 16384
    rng = np.random.default_rng(0)
    q = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, (B, L))]
    t = q.copy()
    mut = rng.random((B, L)) < 0.05
    t[mut] = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, int(mut.sum()))]
    m = L - 64
    query = np.full((B, L), 0x01, np.uint8)
    query[:, :m] = q[:, :m]
    target = np.full((B, L), 0x02, np.uint8)
    target[:, :m] = t[:, :m]
    qlen = np.full(B, m, np.int32)
    tlen = np.full(B, m, np.int32)
    axis_q = np.zeros(B, bool)
    mid = tlen // 2
    seed_off = np.full((B, K), NEG_I, np.int32)
    seed_off[:, K // 2] = 0
    seed_anc = np.full((B, K), UNSET32, np.uint32)
    done0 = np.zeros(B, bool)

    eng = PallasSweeps(p, interpret=False)

    def run():
        return eng.sweep(query, target, qlen, tlen, axis_q, mid,
                         seed_off, seed_anc, done0, max_s=200000, K=K)

    f_score, _, _, fin, _clip = run()  # compile + warm
    assert np.asarray(fin).all()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        f_score, _, _, fin, _ = run()
        np.asarray(fin)
        best = min(best, time.time() - t0)

    cells = int(np.asarray(f_score).astype(np.int64).sum()) * K * 5
    gcells = cells / best / 1e9
    baseline = 10.0  # Gcells/s, 8-core AVX2 WFA2-lib estimate
    print(json.dumps({
        "metric": "wfa_sweep_throughput",
        "value": round(gcells, 4),
        "unit": "Gcells/s/chip",
        "vs_baseline": round(gcells / baseline, 4),
    }), flush=True)


def main() -> None:
    from wfmash_tpu.utils import jaxcache

    jaxcache.enable()
    from wfmash_tpu.align.engine import run_alignment
    from wfmash_tpu.params import AlignParams, MapParams
    from wfmash_tpu.runner import _device_rtt_ms, run_mapping
    from wfmash_tpu.utils import perf

    # subprocess-guarded probe FIRST: a dead tunnel degrades the whole
    # bench to the host paths instead of hanging device init
    rtt = _device_rtt_ms()
    log(f"[bench] device RTT: {rtt:.1f} ms")

    if rtt != float("inf"):
        try:
            bench_sweep()
        except Exception as e:  # keep the headline metric alive regardless
            log(f"[bench] sweep benchmark failed: {e}")
    else:
        log("[bench] device unreachable; skipping sweep benchmark")
        # keep the perf-trio line count stable for round-over-round
        # comparison even when the tunnel is down
        print(json.dumps({
            "metric": "wfa_sweep_throughput",
            "value": None,
            "unit": "Gcells/s/chip (device unreachable this run)",
            "vs_baseline": None,
        }), flush=True)

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

    # finalize() applies the reference's padding rules (min(w, 5000) per
    # side, parse_args.hpp:593-621) — benchmarking unpadded records
    # would understate the align work vs the reference's own runs
    ap = AlignParams(
        ref_sequences=[LPA], query_sequences=[LPA],
        mashmap_paf_file=map_paf, threads=threads,
    ).finalize(mp.window_length)

    t0 = time.time()
    out1 = io.StringIO()
    run_alignment(ap, out1)
    log(f"[bench] align warm-up (incl. compiles): {time.time() - t0:.1f}s")

    perf.reset()
    t0 = time.time()
    out2 = io.StringIO()
    run_alignment(ap, out2)
    align_wall = time.time() - t0
    n_aligned = out2.getvalue().count("\n")
    log(f"[bench] align warm: {n_aligned} records in {align_wall:.2f}s")
    assert out1.getvalue() == out2.getvalue(), "non-deterministic output"
    assert n_aligned > 2000, "suspiciously few aligned records"

    device_s = perf.get("align.device_s")
    busy = device_s / align_wall if align_wall > 0 else 0.0
    log(f"[bench] device busy: {device_s:.2f}s of {align_wall:.2f}s align "
        f"wall ({perf.get('align.device_calls'):.0f} kernel batches)")
    unit = "device wall / align wall (warm pass)"
    if device_s == 0:
        unit += (" — latency-aware backend chose the native host engine"
                 " (device RTT %s)" % ("inf" if rtt == float("inf")
                                       else f"{rtt:.0f} ms"))
    print(json.dumps({
        "metric": "align_device_busy_fraction",
        "value": round(busy, 4),
        "unit": unit,
        "vs_baseline": round(busy / 0.5, 4),   # VERDICT target: >= 0.5
    }), flush=True)

    try:
        os.unlink(map_paf)
    except OSError:
        pass

    value = map_wall + align_wall
    cores = os.cpu_count() or 1
    print(json.dumps({
        "metric": "lpa_allvsall_e2e_warm_wall",
        "value": round(value, 2),
        "unit": "s (map+align, lower is better)",
        "vs_baseline": round(BASELINE_WALL / value, 4),
        # the reference wall is an 8-core number (42.3 s user); the
        # per-core comparison is our wall*cores vs their user time
        "vs_baseline_user_percore": round(
            BASELINE_USER / (value * cores), 4),
        "cores": cores,
    }), flush=True)


if __name__ == "__main__":
    main()
