"""Coverage computation — the TERefiner Coverage replacement (C5).

Reference semantics (/root/reference/TERefiner/Coverage.cpp):
  calcCoverage (-B, :14-141): per-base pileup over the M-segments of
    mapped reads -> mean coverage + covered length per contig.
  calcCoveageWithCutoff (-G, :144-185): per-contig Σ(M-length) /
    contig_len over reads whose M-fraction >= cutoff.

The cutoff variant is exact from the columnar M-sums; the per-base
variant approximates each read's M-segments with the single span
[pos, pos+nmatch) (the columnar store keeps total M, not per-segment
CIGAR — interior indels shift bases by at most the indel length).
"""

from __future__ import annotations

import numpy as np


def coverage_with_cutoff(tid, nmatch, read_len, contig_lens,
                         cutoff: float = 0.99):
    """Per-contig mean coverage counting reads with M-fraction >= cutoff.

    Returns float64 [C] mean coverage (reference -G mode output,
    refiner.cpp:1381-1451)."""
    C = len(contig_lens)
    ok = (read_len > 0) & (nmatch >= cutoff * read_len) & (tid >= 0) & \
        (tid < C)
    total = np.zeros(C, np.int64)
    np.add.at(total, tid[ok], nmatch[ok].astype(np.int64))
    lens = np.maximum(np.asarray(contig_lens, np.int64), 1)
    return total / lens


def per_base_coverage(tid, pos, nmatch, contig_lens):
    """Per-base pileup; returns (mean_cov [C], covered_len [C]).

    Reference -B mode (Coverage.cpp:14-141)."""
    C = len(contig_lens)
    out_mean = np.zeros(C, np.float64)
    out_cov = np.zeros(C, np.int64)
    for c in range(C):
        L = int(contig_lens[c])
        if L <= 0:
            continue
        sel = (tid == c) & (nmatch > 0)
        if not sel.any():
            continue
        diff = np.zeros(L + 1, np.int64)
        s = np.clip(pos[sel], 0, L - 1)
        e = np.clip(pos[sel] + nmatch[sel], 0, L)
        np.add.at(diff, s, 1)
        np.add.at(diff, e, -1)
        depth = np.cumsum(diff[:-1])
        out_mean[c] = depth.mean()
        out_cov[c] = int((depth > 0).sum())
    return out_mean, out_cov
