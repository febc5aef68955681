"""FASTA reading/writing into columnar arrays.

The genome is stored as ONE concatenated int8 code array with a SEP
sentinel between scaffolds (so N-run detection can never bridge two
scaffolds) plus an offsets table — the columnar replacement for the
reference's per-record Biopython iteration
(/root/reference/gnrt_pos_true_seqs.py:14) and .fai random access
(/root/reference/TERefiner/fai_parser.cpp).
"""

from __future__ import annotations

import dataclasses
import io
import os

import numpy as np

from .. import dna


@dataclasses.dataclass
class Genome:
    """Concatenated scaffolds. ``seq[offsets[i]:offsets[i]+lengths[i]]``
    is scaffold i; one SEP code sits between consecutive scaffolds."""

    seq: np.ndarray        # int8 codes, len = sum(lengths) + (S-1)
    offsets: np.ndarray    # int64 [S] start of each scaffold in seq
    lengths: np.ndarray    # int64 [S]
    names: list[str]

    @property
    def num_scaffolds(self) -> int:
        return len(self.names)

    def scaffold(self, i: int) -> np.ndarray:
        return self.seq[self.offsets[i]: self.offsets[i] + self.lengths[i]]

    def scaffold_index(self, positions: np.ndarray) -> np.ndarray:
        """Map global positions in ``seq`` to scaffold indices."""
        return np.searchsorted(self.offsets, np.asarray(positions), side="right") - 1

    def to_local(self, positions: np.ndarray) -> np.ndarray:
        """Convert global positions to per-scaffold coordinates."""
        return np.asarray(positions) - self.offsets[self.scaffold_index(positions)]


def read_fasta(path: str | os.PathLike) -> Genome:
    names: list[str] = []
    chunks: list[bytes] = []
    cur: list[bytes] = []
    with open(path, "rb") as fh:
        for line in fh:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(b">"):
                if names:
                    chunks.append(b"".join(cur))
                    cur = []
                names.append(line[1:].split()[0].decode("ascii"))
            else:
                cur.append(line)
    if names:
        chunks.append(b"".join(cur))
    if not names:
        return Genome(np.zeros(0, np.int8), np.zeros(0, np.int64),
                      np.zeros(0, np.int64), [])

    lengths = np.array([len(c) for c in chunks], dtype=np.int64)
    offsets = np.zeros(len(chunks), dtype=np.int64)
    np.cumsum(lengths[:-1] + 1, out=offsets[1:])  # +1 for SEP between
    total = int(offsets[-1] + lengths[-1])
    seq = np.full(total, dna.SEP, dtype=np.int8)
    for off, chunk in zip(offsets, chunks):
        seq[off: off + len(chunk)] = dna.encode(chunk)
    return Genome(seq=seq, offsets=offsets, lengths=lengths, names=names)


def iter_fasta(path: str | os.PathLike):
    """Yield (name, int8 codes) per record without concatenation."""
    g = read_fasta(path)
    for i, name in enumerate(g.names):
        yield name, g.scaffold(i)


def write_fasta(path_or_fh, records, width: int = 80) -> None:
    """Write (name, codes-or-str) records as FASTA."""
    own = isinstance(path_or_fh, (str, os.PathLike))
    fh = open(path_or_fh, "w") if own else path_or_fh
    try:
        for name, seq in records:
            if not isinstance(seq, str):
                seq = dna.decode(seq)
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i: i + width] + "\n")
            if len(seq) == 0:
                fh.write("\n")
    finally:
        if own:
            fh.close()


def write_fai(fasta_path: str | os.PathLike,
              out_path: str | os.PathLike | None = None) -> str:
    """Write a samtools-compatible .fai index for a FASTA file (the
    reference shells out `samtools faidx`, main.py:208-210).

    Columns: name, length, byte offset of first base, bases per line,
    bytes per line (incl. newline)."""
    out_path = str(out_path or (str(fasta_path) + ".fai"))
    rows = []
    with open(fasta_path, "rb") as fh:
        name = None
        length = 0
        offset = 0
        linebases = 0
        linewidth = 0
        first_line = True
        pos = 0
        for line in fh:
            ll = len(line)
            stripped = line.rstrip(b"\r\n")
            if stripped.startswith(b">"):
                if name is not None:
                    rows.append((name, length, offset, linebases, linewidth))
                name = stripped[1:].split()[0].decode()
                length = 0
                offset = pos + ll
                first_line = True
            elif stripped:
                if first_line:
                    linebases = len(stripped)
                    linewidth = ll
                    first_line = False
                length += len(stripped)
            pos += ll
        if name is not None:
            rows.append((name, length, offset, linebases, linewidth))
    with open(out_path, "w") as fh:
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")
    return out_path


def fasta_string(records, width: int = 80) -> str:
    buf = io.StringIO()
    write_fasta(buf, records, width)
    return buf.getvalue()
