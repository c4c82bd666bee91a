"""Measure the hybrid DEVICE align path E2E through the tunnel.

VERDICT round-3 #4: "Make the device align path win through a >=20 ms
link, not just hypothetically at <1 ms" — collapse launches
(WFMASH_TPU_SEG_GROUPS_SCALE) and measure the hybrid device E2E on LPA
all-vs-all against the exact host engine (58 s at r03; 249.7 s was the
r03 hybrid number). Launch count comes from the perf counter
`align.device_calls` (plus `align.device_s` for busy time).

Protocol: host mapping (the device L1/L2 choice is orthogonal and
measured separately), then align with the segmented device engine
forced on (WFMASH_TPU_SEGMENTED=1). Two passes: cold (absorbs
server-side Mosaic compiles, 30-400 s/shape through the axon tunnel)
and warm (the reported number).

Usage: python scripts/hybrid_device_bench.py [groups_scale]
Writes one JSON line to stdout.
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LPA = "/root/reference/data/LPA.subset.fa.gz"


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "8"
    os.environ["WFMASH_TPU_SEGMENTED"] = "1"
    os.environ["WFMASH_TPU_SEG_GROUPS_SCALE"] = scale
    os.environ.setdefault("WFMASH_TPU_DEVICE_L1", "0")
    os.environ.setdefault("WFMASH_TPU_PERF", "1")
    # one routing decision for both passes (no mid-run RTT re-probe)
    os.environ.setdefault("WFMASH_TPU_RTT_TTL_S", "100000")

    from wfmash_tpu.utils import jaxcache
    jaxcache.enable()
    from wfmash_tpu.utils import perf
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
    map_paf = "/tmp/wfmash-tpu-hybrid-map.paf"
    with open(map_paf, "w") as fh:
        fh.write(buf.getvalue())

    ap = AlignParams(
        ref_sequences=[LPA], query_sequences=[LPA],
        mashmap_paf_file=map_paf, threads=threads,
    ).finalize(mp.window_length)

    walls = []
    outs = []
    for label in ("cold", "warm"):
        perf.reset()
        t0 = time.time()
        out = io.StringIO()
        run_alignment(ap, out)
        wall = time.time() - t0
        walls.append(wall)
        outs.append(out.getvalue())
        dev_s = perf.get("align.device_s")
        launches = perf.get("align.device_calls")
        print(json.dumps({
            "pass": label, "groups_scale": int(scale),
            "map_wall_s": round(map_wall, 2),
            "align_wall_s": round(wall, 2),
            "device_busy_s": round(dev_s, 2),
            "device_launches": int(launches),
            "rows": out.getvalue().count("\n"),
        }), flush=True)
    assert outs[0] == outs[1], "non-deterministic hybrid output"
    save = os.environ.get("WFMASH_TPU_HYBRID_OUT")
    if save:
        with open(save, "w") as fh:
            fh.write(outs[1])


if __name__ == "__main__":
    main()
