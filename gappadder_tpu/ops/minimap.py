"""Whole-genome minimizer seed index + short-read mapper (L2).

The reference cannot map reads itself: it REQUIRES externally produced
`bwa mem` BAMs as pipeline input (configuration.json "alignments",
README.md:46-84) and shells out to bwa for every flank/contig
placement. This module removes that external dependency for the
read->draft case: a minimizer-subsampled k-mer index of the whole
draft (the standard (w,k)-minimizer scheme) plus a vote-and-verify
placement pass produce the same columnar Alignments the collect stage
consumes — and, through io.bam.write_bam_columns, a standard BAM for
samtools interop.

Design: index build and lookup are columnar numpy passes (host-side,
chunked, bounded memory); candidate verification is a dense gather +
compare over all candidates at once. Diagonal voting follows the
minimap seed-chaining idea collapsed to exact-diagonal bins (adequate
for short Illumina-class reads, which the GAPPadder pipeline targets;
indel tolerance comes from the +/- band merging of adjacent bins).

Coordinates: positions are GLOBAL offsets into Genome.seq (scaffold
separators are non-ACGT codes, so no k-mer window crosses a boundary);
`Genome.scaffold_index`/`to_local` convert to per-scaffold BAM coords.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import dna
from ..io import fasta

_U64 = np.uint64
_INVALID = _U64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer: uniform hash of packed k-mer keys so
    minimizer sampling is unbiased by base composition."""
    x = x.astype(_U64, copy=True)
    x += _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def canonical_kmer_hashes(codes: np.ndarray, k: int):
    """Canonical k-mer hashes of one code array.

    Returns (hashes uint64 [P], strand uint8 [P]) with P = len-k+1;
    windows containing any non-ACGT code hash to _INVALID. strand=1
    means the reverse complement was the canonical form.
    """
    codes = np.asarray(codes, np.int8)
    L = len(codes)
    P = L - k + 1
    if P <= 0:
        return np.zeros(0, _U64), np.zeros(0, np.uint8)
    bad = (codes < 0) | (codes > 3)
    safe = np.where(bad, 0, codes).astype(_U64)
    comp = _U64(3) - safe
    fwd = np.zeros(P, _U64)
    rev = np.zeros(P, _U64)
    for j in range(k):
        fwd = (fwd << _U64(2)) | safe[j:j + P]
    for j in range(k - 1, -1, -1):
        rev = (rev << _U64(2)) | comp[j:j + P]
    strand = (rev < fwd).astype(np.uint8)
    canon = np.minimum(fwd, rev)
    h = _splitmix64(canon)
    cb = np.zeros(L + 1, np.int32)
    np.cumsum(bad, out=cb[1:])
    win_bad = (cb[k:] - cb[:P]) > 0
    h[win_bad] = _INVALID
    return h, strand


def _minimizer_positions(h: np.ndarray, w: int) -> np.ndarray:
    """Positions selected by the (w,k)-minimizer rule: for every window
    of w consecutive k-mers, the leftmost position of the minimum hash."""
    P = len(h)
    if P == 0:
        return np.zeros(0, np.int64)
    if P <= w:
        m = int(np.argmin(h))
        return (np.array([m], np.int64) if h[m] != _INVALID
                else np.zeros(0, np.int64))
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    picks = np.arange(len(win), dtype=np.int64) + np.argmin(win, axis=1)
    picks = np.unique(picks)
    return picks[h[picks] != _INVALID]


@dataclasses.dataclass
class MinimizerIndex:
    """Sorted (hash -> global position, strand) table of the draft."""
    k: int
    w: int
    keys: np.ndarray      # uint64 [M] sorted
    pos: np.ndarray       # int64 [M] global position in Genome.seq
    strand: np.ndarray    # uint8 [M]
    max_occ: int = 64     # repeat cutoff: keys more frequent are skipped


def build_index(genome: fasta.Genome, k: int = 17, w: int = 8,
                chunk: int = 32 << 20, max_occ: int = 64) -> MinimizerIndex:
    """Minimizer index of the whole draft, built in bounded-memory
    chunks (k-1+w-1 overlap keeps windows spanning chunk cuts)."""
    seq = genome.seq
    L = len(seq)
    overlap = k + w - 2
    keys_l, pos_l, str_l = [], [], []
    start = 0
    while start < L:
        end = min(L, start + chunk)
        lo = max(0, start - overlap)
        h, s = canonical_kmer_hashes(seq[lo:end], k)
        picks = _minimizer_positions(h, w)
        gpos = picks + lo
        keep = gpos >= start  # windows fully reported by previous chunk
        if start == 0:
            keep = np.ones(len(gpos), bool)
        keys_l.append(h[picks[keep]])
        pos_l.append(gpos[keep])
        str_l.append(s[picks[keep]])
        start = end
    keys = np.concatenate(keys_l) if keys_l else np.zeros(0, _U64)
    pos = np.concatenate(pos_l) if pos_l else np.zeros(0, np.int64)
    strand = np.concatenate(str_l) if str_l else np.zeros(0, np.uint8)
    order = np.argsort(keys, kind="stable")
    return MinimizerIndex(k=k, w=w, keys=keys[order], pos=pos[order],
                          strand=strand[order], max_occ=max_occ)


@dataclasses.dataclass
class Placements:
    """Best placement per read (global coordinates)."""
    gstart: np.ndarray    # int64 [N] global start (-1 unmapped)
    strand: np.ndarray    # uint8 [N] 1 = reverse
    nmatch: np.ndarray    # int32 [N] matching bases after verification
    lclip: np.ndarray     # int32 [N] soft clip at scaffold edge (left)
    rclip: np.ndarray     # int32 [N]
    mapq: np.ndarray      # int32 [N]


def map_reads(genome: fasta.Genome, index: MinimizerIndex,
              seq: np.ndarray, length: np.ndarray,
              min_votes: int = 2, min_identity: float = 0.9,
              max_hits_per_seed: int = 16) -> Placements:
    """Place each read on the draft: minimizer lookup -> exact-diagonal
    voting -> gather-and-compare verification -> mapq from vote margin.

    seq: int8 [N, Lmax]; length: int32 [N].
    """
    N, Lmax = seq.shape
    k, w = index.k, index.w

    # ---- read minimizers (vectorized over the batch) --------------------
    cand_read, cand_strand, cand_diag = [], [], []
    flat = []
    for i in range(N):
        ln = int(length[i])
        h, s = canonical_kmer_hashes(seq[i, :ln], k)
        picks = _minimizer_positions(h, w)
        flat.append((i, ln, picks, h[picks], s[picks]))
    if not flat:
        z = np.zeros(0, np.int64)
        return Placements(z, z.astype(np.uint8), z.astype(np.int32),
                          z.astype(np.int32), z.astype(np.int32),
                          z.astype(np.int32))
    rid = np.concatenate([np.full(len(p), i, np.int32)
                          for i, _, p, _, _ in flat])
    rpos = np.concatenate([p for _, _, p, _, _ in flat])
    rkey = np.concatenate([hk for _, _, _, hk, _ in flat])
    rstr = np.concatenate([s for _, _, _, _, s in flat])
    rlen_of = length.astype(np.int64)

    # ---- index lookup with repeat cutoff ---------------------------------
    lo = np.searchsorted(index.keys, rkey, side="left")
    hi = np.searchsorted(index.keys, rkey, side="right")
    cnt = hi - lo
    ok = (cnt > 0) & (cnt <= index.max_occ)
    take = np.minimum(cnt, max_hits_per_seed)
    reps = np.where(ok, take, 0)
    src = np.repeat(np.arange(len(rkey)), reps)
    # offsets 0..reps-1 within each seed's hit range
    off = np.arange(len(src)) - np.repeat(
        np.cumsum(reps) - reps, reps)
    ipos = index.pos[lo[src] + off]
    istr = index.strand[lo[src] + off]

    mstrand = (rstr[src] ^ istr).astype(np.int64)     # 0 fwd, 1 rev
    rp = rpos[src]
    rl = rlen_of[rid[src]]
    # fwd: gstart = ipos - rp; rev: gstart = ipos + rp - (rl - k)
    gstart = np.where(mstrand == 0, ipos - rp, ipos + rp - (rl - k))
    reads = rid[src].astype(np.int64)

    # ---- diagonal voting (exact bins + neighbor merge) -------------------
    # key = (read, strand, gstart); votes = multiplicity
    vkey = (reads << 34) | (mstrand << 33) | (gstart + (1 << 32))
    vkey, vinv, votes = np.unique(vkey, return_inverse=True,
                                  return_counts=True)
    # merge votes from gstarts within +/-4 (small indels / edge wobble)
    merged = votes.astype(np.int64).copy()
    for d in (1, 2, 3, 4):
        same = (vkey[d:] - vkey[:-d]) <= d  # same read+strand, close diag
        merged[d:][same] += votes[:-d][same]
        merged[:-d][same] += votes[d:][same]

    vread = (vkey >> 34).astype(np.int64)
    best_votes = np.zeros(N, np.int64)
    np.maximum.at(best_votes, vread, merged)
    is_best = merged == best_votes[vread]
    # leftmost best candidate per read (deterministic tie-break)
    first_best = np.full(N, -1, np.int64)
    idxs = np.flatnonzero(is_best)
    np.minimum.at(first_best, vread[idxs],
                  np.where(first_best[vread[idxs]] < 0, idxs,
                           first_best[vread[idxs]]))
    # np.minimum.at with -1 sentinel is wrong; rebuild properly:
    first_best = np.full(N, len(vkey), np.int64)
    np.minimum.at(first_best, vread[idxs], idxs)
    # second-best vote count (different diagonal group, > 4 apart)
    second = np.zeros(N, np.int64)
    far = np.ones(len(vkey), bool)
    fb = np.clip(first_best, 0, max(len(vkey) - 1, 0))
    far[idxs] = np.abs(vkey[idxs] - vkey[fb[vread[idxs]]]) > 4
    np.maximum.at(second, vread[far], merged[far])

    have = (first_best < len(vkey))
    cand = np.clip(first_best, 0, max(len(vkey) - 1, 0))
    c_votes = np.where(have, merged[cand], 0)
    c_strand = np.where(have, (vkey[cand] >> 33) & 1, 0).astype(np.uint8)
    c_gstart = np.where(have, (vkey[cand] & ((1 << 33) - 1)) - (1 << 32),
                        -1)
    mapped = have & (c_votes >= min_votes)

    # ---- verification: gather genome slice, compare ----------------------
    glen = len(genome.seq)
    rl_all = rlen_of
    gs = np.where(mapped, c_gstart, 0)
    cols = gs[:, None] + np.arange(Lmax)[None, :]
    inb = (cols >= 0) & (cols < glen) & (np.arange(Lmax)[None, :] <
                                         rl_all[:, None])
    gseq = genome.seq[np.clip(cols, 0, glen - 1)]
    # read bases in mapping orientation
    rseq = seq.copy()
    for i in np.flatnonzero(mapped & (c_strand == 1)):
        ln = int(length[i])
        rseq[i, :ln] = dna.revcomp(seq[i, :ln])
    match = inb & (gseq == rseq) & (gseq <= 3)
    # restrict to the read's own scaffold (no crossing separators)
    scaf = genome.scaffold_index(np.clip(gs, 0, max(glen - 1, 0)))
    scaf = np.clip(scaf, 0, max(genome.num_scaffolds - 1, 0))
    if genome.num_scaffolds:
        s_lo = genome.offsets[scaf]
        s_hi = genome.offsets[scaf] + genome.lengths[scaf]
        inscaf = (cols >= s_lo[:, None]) & (cols < s_hi[:, None])
        match = match & inscaf
        valid_col = inb & inscaf
    else:
        valid_col = inb
    nmatch = match.sum(axis=1).astype(np.int32)
    covered = valid_col.sum(axis=1).astype(np.int32)
    good = mapped & (covered > 0) & \
        (nmatch >= (min_identity * covered).astype(np.int32)) & \
        (nmatch >= (0.5 * rl_all).astype(np.int32))

    # clips = read bases hanging off the scaffold ends
    firstc = np.argmax(valid_col, axis=1).astype(np.int32)
    lastc = (Lmax - 1 - np.argmax(valid_col[:, ::-1], axis=1)).astype(
        np.int32)
    lclip = np.where(good, firstc, 0).astype(np.int32)
    rclip = np.where(good, np.maximum(
        rl_all.astype(np.int32) - 1 - lastc, 0), 0).astype(np.int32)

    margin = c_votes - second
    mapq = np.where(second == 0, 60,
                    np.clip(6 * margin, 0, 60)).astype(np.int32)
    mapq = np.where(good, mapq, 0)

    return Placements(
        gstart=np.where(good, c_gstart, -1),
        strand=np.where(good, c_strand, 0).astype(np.uint8),
        nmatch=np.where(good, nmatch, 0),
        lclip=lclip, rclip=rclip, mapq=mapq)
