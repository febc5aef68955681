"""Reference (host/numpy) affine-gap DP oracle with traceback.

Small/slow but exact: used as the unit-test oracle for the XLA and
Pallas wavefront kernels, and as the host-side traceback for the few
winning pairs (device kernels are score+endpoint-only; SURVEY.md §7
"Hard parts" #3).

Subsumes the reference's vendored stdaln local aligner
(/root/reference/TERefiner/algorithms/local_alignment.cpp:746-831) and
the ContigsMerger overlap DP ``Evaluate``
(/root/reference/ContigsCompactor-v0.2.0/ContigsMerger/ContigsCompactor.cpp:1572-1874).

Modes:
  local      Smith-Waterman: H clamped at 0, best anywhere.
  overlap    free leading/trailing gaps on both sequences (init row/col
             0, no clamp, best restricted to last row/column) — the
             contig-merge overlap alignment.
  extend     anchored at (0,0), best anywhere (seed extension).
"""

from __future__ import annotations

import dataclasses

import numpy as np

NEG = -(1 << 28)


@dataclasses.dataclass(frozen=True)
class SWParams:
    match: int = 1
    mismatch: int = -1       # ContigsMerger default -i1 (applied to N too)
    gap_open: int = 1        # cost of first gap base (positive numbers)
    gap_extend: int = 1      # cost per additional gap base
    # reference ContigsMerger scores indels -1/base (linear);
    # gap_open == gap_extend reproduces linear gap cost.


def sw_np(q: np.ndarray, t: np.ndarray, p: SWParams = SWParams(),
          mode: str = "local"):
    """Full DP. Returns (score, qend, tend, H) with 1-based ends
    (qend/tend = number of consumed bases of q/t at the best cell)."""
    n, m = len(q), len(t)
    H = np.zeros((n + 1, m + 1), np.int64)
    E = np.full((n + 1, m + 1), NEG, np.int64)  # gap in target dir (left)
    F = np.full((n + 1, m + 1), NEG, np.int64)  # gap in query dir (up)
    if mode == "extend":
        H[0, 1:] = NEG
        H[1:, 0] = NEG
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            E[i, j] = max(H[i, j - 1] - p.gap_open, E[i, j - 1] - p.gap_extend)
            F[i, j] = max(H[i - 1, j] - p.gap_open, F[i - 1, j] - p.gap_extend)
            s = p.match if q[i - 1] == t[j - 1] else p.mismatch
            h = max(H[i - 1, j - 1] + s, E[i, j], F[i, j])
            if mode == "local":
                h = max(h, 0)
            H[i, j] = h
    if mode == "overlap":
        # best over last row / last column
        cand = [(H[n, j], n, j) for j in range(m + 1)]
        cand += [(H[i, m], i, m) for i in range(n + 1)]
        score, qend, tend = max(cand, key=lambda x: (x[0], x[1], x[2]))
    else:
        flat = np.argmax(H)
        qend, tend = divmod(int(flat), m + 1)
        score = int(H[qend, tend])
    return int(score), int(qend), int(tend), H


def traceback(q, t, p: SWParams, mode: str, qend: int, tend: int):
    """Recompute DP and trace the optimal path ending at (qend, tend).

    Returns (qstart, tstart, cigar) with cigar a list of (op, length),
    op in 'M','I','D' ('I' consumes query, 'D' consumes target —
    BAM convention with q as the read).
    """
    score, _, _, H = sw_np(q, t, p, mode)
    E = np.full_like(H, NEG)
    F = np.full_like(H, NEG)
    n, m = len(q), len(t)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            E[i, j] = max(H[i, j - 1] - p.gap_open, E[i, j - 1] - p.gap_extend)
            F[i, j] = max(H[i - 1, j] - p.gap_open, F[i - 1, j] - p.gap_extend)
    ops: list[str] = []
    i, j = qend, tend
    state = "H"
    while i > 0 or j > 0:
        if state == "H":
            if mode == "local" and H[i, j] == 0:
                break
            if mode == "overlap" and (i == 0 or j == 0):
                break
            if i > 0 and j > 0:
                s = p.match if q[i - 1] == t[j - 1] else p.mismatch
                if H[i, j] == H[i - 1, j - 1] + s:
                    ops.append("M"); i -= 1; j -= 1
                    continue
            if j > 0 and H[i, j] == E[i, j]:
                state = "E"; continue
            if i > 0 and H[i, j] == F[i, j]:
                state = "F"; continue
            break  # boundary (extend mode origin)
        elif state == "E":
            ops.append("D"); j -= 1
            if not (j > 0 and E[i, j + 1] == E[i, j] - p.gap_extend):
                state = "H"
        else:
            ops.append("I"); i -= 1
            if not (i > 0 and F[i + 1, j] == F[i, j] - p.gap_extend):
                state = "H"
    ops.reverse()
    cigar: list[tuple[str, int]] = []
    for op in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + 1)
        else:
            cigar.append((op, 1))
    return i, j, cigar
