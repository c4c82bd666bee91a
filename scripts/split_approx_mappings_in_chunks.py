#!/usr/bin/env python3
"""Split an approximate-mapping PAF into N weight-balanced chunks.

Cluster-scale alignment workflow (reference:
scripts/split_approx_mappings_in_chunks.py:1-57): map once with `-m`,
split the PAF so each chunk carries a similar amount of *alignment*
work, then run `wfmash_tpu -i chunk_k.paf` jobs in parallel. A
mapping's weight is its mapped length scaled by its divergence —
`max(qspan, tspan) * (1 - estimated_identity)` — since more divergent
blocks cost more wavefront steps.

Usage: split_approx_mappings_in_chunks.py mappings.paf N
Writes mappings.paf.chunk_0.paf ... chunk_{N-1}.paf.
"""

import sys


def mapping_weight(line: str) -> float:
    f = line.rstrip("\n").split("\t")
    qspan = int(f[3]) - int(f[2])
    tspan = int(f[8]) - int(f[7])
    identity = None
    for tag in f[12:]:
        if tag.startswith("id:f:"):
            identity = float(tag[5:]) / 100.0
            break
    if identity is None:
        # column 13 in mashmap output style; fall back to fully divergent
        identity = 0.0
    return max(qspan, tspan) * (1.0 - identity)


def balance(weights: list[float], n: int) -> list[list[int]]:
    """Greedy least-loaded assignment preserving input order per chunk."""
    chunks: list[list[int]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for i, w in enumerate(weights):
        k = loads.index(min(loads))
        chunks[k].append(i)
        loads[k] += w
    return chunks


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    path, n = sys.argv[1], int(sys.argv[2])
    with open(path) as fh:
        lines = fh.readlines()
    chunks = balance([mapping_weight(l) for l in lines], n)
    for k, idxs in enumerate(chunks):
        with open(f"{path}.chunk_{k}.paf", "w") as out:
            for i in idxs:
                out.write(lines[i])


if __name__ == "__main__":
    main()
