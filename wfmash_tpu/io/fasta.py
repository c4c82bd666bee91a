"""FASTA access via .fai indexes (plain, gzip, or BGZF files).

Host-side equivalent of wfmash's faigz wrapper over htslib faidx
(reference: src/common/faigz.h) and seqiter (src/common/seqiter.hpp):

* metadata comes from the ``.fai`` index (name, length, offset, linebases,
  linewidth) — required, as in the reference;
* `fetch(name, start, end)` returns bases with an INCLUSIVE end coordinate,
  matching ``faidx_reader_fetch_seq`` semantics (faigz.h; clamps end to the
  sequence length);
* compressed inputs (.gz) are BGZF/gzip; we decompress once into a shared
  in-memory buffer and serve random access from it. This trades memory for
  simplicity — a native BGZF+.gzi virtual-offset reader is a later
  optimization; the API will not change.

Sequences are served as raw bytes (no normalization); uppercase + non-ACGT→N
normalization happens in the sketching layer exactly where the reference does
it (commonFunc.hpp:132-142).
"""

from __future__ import annotations

import gzip
import os
from dataclasses import dataclass
from threading import Lock


@dataclass(frozen=True)
class FaiRecord:
    name: str
    length: int
    offset: int      # byte offset of first base in the (uncompressed) FASTA
    linebases: int   # bases per line
    linewidth: int   # bytes per line including newline(s)


def read_fai(path: str) -> list[FaiRecord]:
    records = []
    with open(path, "rt") as fh:
        for line in fh:
            if not line.strip():
                continue
            parts = line.rstrip("\n").split("\t")
            records.append(
                FaiRecord(
                    name=parts[0],
                    length=int(parts[1]),
                    offset=int(parts[2]),
                    linebases=int(parts[3]),
                    linewidth=int(parts[4]),
                )
            )
    return records


class FastaReader:
    """Random access to an indexed FASTA file (thread-safe, lazily loaded)."""

    def __init__(self, path: str):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        fai_path = path + ".fai"
        if not os.path.exists(fai_path):
            raise FileNotFoundError(
                f"FASTA index not found: {fai_path} (run `samtools faidx`)"
            )
        self.path = path
        self.records = read_fai(fai_path)
        self._by_name = {r.name: r for r in self.records}
        self._data: bytes | None = None
        self._lock = Lock()

    # -- metadata ----------------------------------------------------------
    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    @property
    def names(self) -> list[str]:
        return [r.name for r in self.records]

    def seq_len(self, name: str) -> int:
        return self._by_name[name].length

    # -- data --------------------------------------------------------------
    def _load(self) -> bytes:
        if self._data is None:
            with self._lock:
                if self._data is None:
                    with open(self.path, "rb") as fh:
                        head = fh.read(2)
                        fh.seek(0)
                        if head == b"\x1f\x8b":
                            # BGZF is valid multi-member gzip
                            self._data = gzip.decompress(fh.read())
                        else:
                            self._data = fh.read()
        return self._data

    def fetch(self, name: str, start: int = 0, end: int | None = None) -> bytes:
        """Fetch bases [start, end] (0-based, INCLUSIVE end, faigz semantics).

        ``end=None`` fetches to the end of the sequence. Out-of-range
        coordinates are clamped, as htslib does.
        """
        rec = self._by_name[name]
        if end is None or end >= rec.length:
            end = rec.length - 1
        start = max(0, start)
        if end < start:
            return b""
        data = self._load()
        lb, lw = rec.linebases, rec.linewidth
        first_line = start // lb
        last_line = end // lb
        lo = rec.offset + first_line * lw + (start % lb)
        hi = rec.offset + last_line * lw + (end % lb) + 1
        raw = data[lo:hi]
        if first_line == last_line:
            return raw
        # strip line terminators (lw - lb trailing bytes per line)
        out = bytearray()
        # first partial line
        take = lb - (start % lb)
        out += raw[:take]
        pos = take + (lw - lb)
        full_needed = last_line - first_line - 1
        for _ in range(full_needed):
            out += raw[pos : pos + lb]
            pos += lw
        out += raw[pos : pos + (end % lb) + 1]
        return bytes(out)

    def iter_seqs(self, subset: list[str] | None = None):
        """Yield (name, bytes) for each sequence (optionally restricted),
        in file (.fai) order — matches seqiter::for_each_seq_in_file."""
        allowed = set(subset) if subset is not None else None
        for rec in self.records:
            if allowed is not None and rec.name not in allowed:
                continue
            yield rec.name, self.fetch(rec.name)
