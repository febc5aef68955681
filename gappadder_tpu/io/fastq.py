"""FASTQ reading into columnar arrays (+ 64-bit name hashes).

The reference streams raw FASTQ files record-by-record and dict-joins
on read-name strings (run_multi_threads_discordant.py:209-241). Here a
FASTQ library becomes one columnar store: packed int8 sequence codes,
lengths, qualities, and an FNV-1a 64-bit hash per read name; all
downstream recruitment joins are device-side sorts on the hash.

Read names are normalized like the reference: token before first
whitespace, with a trailing "/1" / "/2" stripped
(run_multi_threads_discordant.py:212-214 splits on "/").
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from .. import dna

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a(name: bytes) -> int:
    """FNV-1a 64-bit hash of a byte string."""
    h = _FNV_OFFSET
    for b in name:
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def _fnv1a_batch(names: list[bytes]) -> np.ndarray:
    """Vectorized-ish FNV-1a over a list of names."""
    out = np.empty(len(names), np.uint64)
    P = int(_FNV_PRIME)
    M = 0xFFFFFFFFFFFFFFFF
    for i, nm in enumerate(names):
        h = 0xCBF29CE484222325
        for b in nm:
            h = ((h ^ b) * P) & M
        out[i] = h
    return out


def normalize_name(raw: bytes) -> bytes:
    """'@NAME/1 comment' -> b'NAME' (reference name-matching contract)."""
    if raw.startswith(b"@"):
        raw = raw[1:]
    tok = raw.split()[0] if raw.split() else b""
    slash = tok.rfind(b"/")
    if slash != -1 and tok[slash + 1:] in (b"1", b"2"):
        tok = tok[:slash]
    return tok


@dataclasses.dataclass
class ReadSet:
    """Columnar read store for one FASTQ file."""
    seq: np.ndarray          # int8 [N, Lmax], N-padded
    length: np.ndarray       # int32 [N]
    qual: np.ndarray         # uint8 [N, Lmax] (phred+33 raw bytes)
    name_hash: np.ndarray    # uint64 [N]
    names: list[bytes]       # kept for FASTQ re-emission

    @property
    def n(self) -> int:
        return len(self.length)


def read_fastq(path: str | os.PathLike, max_len: int | None = None) -> ReadSet:
    names: list[bytes] = []
    seqs: list[bytes] = []
    quals: list[bytes] = []
    with open(path, "rb") as fh:
        while True:
            h = fh.readline()
            if not h:
                break
            s = fh.readline().rstrip()
            fh.readline()  # '+'
            q = fh.readline().rstrip()
            names.append(normalize_name(h.rstrip()))
            seqs.append(s)
            quals.append(q)
    n = len(names)
    L = max_len or (max((len(s) for s in seqs), default=0) or 1)
    seq = np.full((n, L), dna.N, np.int8)
    qual = np.zeros((n, L), np.uint8)
    length = np.zeros(n, np.int32)
    for i, (s, q) in enumerate(zip(seqs, quals)):
        m = min(len(s), L)
        seq[i, :m] = dna.encode(s[:m])
        qual[i, :m] = np.frombuffer(q[:m].ljust(m, b"5"), np.uint8)
        length[i] = m
    return ReadSet(seq=seq, length=length, qual=qual,
                   name_hash=_fnv1a_batch(names), names=names)


def subset(readset: ReadSet, rows) -> ReadSet:
    """Row-select a ReadSet (the TERefiner HardClipReads / seqtk-style
    FASTQ subsetting equivalent, TERefiner/HardClipReads.cpp)."""
    rows = np.asarray(rows, np.int64)
    return ReadSet(seq=readset.seq[rows], length=readset.length[rows],
                   qual=readset.qual[rows],
                   name_hash=readset.name_hash[rows],
                   names=[readset.names[int(r)] for r in rows])


def subset_by_names(readset: ReadSet, names) -> ReadSet:
    """Subset by read names (bytes or str), preserving request order."""
    want = [n.encode() if isinstance(n, str) else n for n in names]
    index = {}
    for i, n in enumerate(readset.names):
        index.setdefault(n, i)
    rows = [index[n] for n in want if n in index]
    return subset(readset, rows)


def write_fastq(path_or_fh, readset: ReadSet, rows, suffix: str = "") -> None:
    """Write selected rows as FASTQ; name gets `suffix` appended
    (reference renames to '<id>_1'/'<id>_2',
    run_multi_threads_discordant.py:221,296)."""
    own = isinstance(path_or_fh, (str, os.PathLike))
    if own:
        from . import native
        if native.write_fastq_native(str(path_or_fh), readset, rows, suffix):
            return
    fh = open(path_or_fh, "w") if own else path_or_fh
    try:
        for r in rows:
            r = int(r)
            ln = int(readset.length[r])
            name = readset.names[r].decode("ascii") + suffix
            s = dna.decode(readset.seq[r, :ln])
            q = readset.qual[r, :ln].tobytes().decode("ascii")
            fh.write(f"@{name}\n{s}\n+\n{q}\n")
    finally:
        if own:
            fh.close()
