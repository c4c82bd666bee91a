#!/usr/bin/env python3
"""Emit per-pair wfmash_tpu command lines for cluster all-to-all mapping.

The reference distributes all-vs-all pangenome runs as independent
single-pair jobs (reference: scripts/all2all_jobs.py:1-89): sequences
are grouped at genome / haplotype / contig granularity from their PanSN
names (`sample#haplotype#contig`), every target group is paired with
batches of the other groups as queries, and one command line per
pairing is printed (extra args pass through to wfmash_tpu).

Usage:
  all2all_jobs.py seqs.fa.gz -n 4 -t h -q h [-o jobs.txt] [-- extra args]
"""

import argparse
import sys


def read_fai_names(fasta_file: str) -> list[str]:
    names = []
    with open(fasta_file + ".fai") as fh:
        for line in fh:
            if line.strip():
                names.append(line.split("\t")[0])
    return names


def group_key(name: str, level: str) -> str:
    if "#" not in name:
        return name
    parts = name.split("#")
    if level in ("g", "genome"):
        return parts[0]
    if level in ("h", "haplotype"):
        return "#".join(parts[:2])
    return name  # contig level


def group(names: list[str], level: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for n in names:
        out.setdefault(group_key(n, level), []).append(n)
    return out


def pairings(targets: dict, queries: dict, per_job: int):
    for tg in targets:
        pool = [q for q in queries if q != tg]
        for i in range(0, len(pool), per_job):
            yield tg, pool[i:i + per_job]


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Generate wfmash_tpu command lines for all-to-all "
                    "mapping over PanSN groups.")
    ap.add_argument("fasta_file")
    ap.add_argument("-n", "--num-queries", type=int, default=4,
                    help="query groups per job [4]")
    ap.add_argument("-t", "--target-grouping", default="h",
                    choices=["g", "genome", "h", "haplotype", "c", "contig"])
    ap.add_argument("-q", "--query-grouping", default="h",
                    choices=["g", "genome", "h", "haplotype", "c", "contig"])
    ap.add_argument("-o", "--output", help="write command lines here")
    args, passthrough = ap.parse_known_args()

    names = read_fai_names(args.fasta_file)
    tgroups = group(names, args.target_grouping)
    qgroups = group(names, args.query_grouping)

    out = open(args.output, "w") if args.output else sys.stdout
    extra = (" " + " ".join(passthrough)) if passthrough else ""
    for tg, qs in pairings(tgroups, qgroups, args.num_queries):
        qopt = ",".join(qs)
        out.write(
            f"python -m wfmash_tpu {args.fasta_file} -T {tg} -Q {qopt}"
            f"{extra} > {tg.replace('#', '_')}_vs_"
            f"{'_'.join(q.replace('#', '_') for q in qs)}.paf\n")
    if args.output:
        out.close()


if __name__ == "__main__":
    main()
