"""Scaffolding from contig connection tables — TERefiner -S (C6).

Reference (/root/reference/TERefiner/scaffolding.cpp:103-340): given
contigs and a PE-link table (the -L output), (1) pairs whose estimated
distance is negative are checked for a real suffix/prefix overlap
(> 7 bp local alignment) and merged by trimming; (2) remaining links
with support >= the per-node average link count chain contigs into
scaffolds, joined by N-runs of the estimated distance.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import dna
from ..ops import sw_xla
from ..ops.sw_host import SWParams, traceback

MIN_OVERLAP = 7  # scaffolding.cpp:103-121


def _suffix_prefix_overlap(a: np.ndarray, b: np.ndarray, window: int = 200):
    """Best suffix(a)/prefix(b) overlap length, 0 if < MIN_OVERLAP."""
    wa = a[-window:]
    wb = b[:window]
    p = SWParams(1, -3, 5, 2)
    L = max(len(wa), len(wb), 8)
    q = np.full((1, L), dna.N, np.int8)
    t = np.full((1, L), dna.N, np.int8)
    q[0, :len(wa)] = wa
    t[0, :len(wb)] = wb
    s, qe, te = sw_xla.sw_batch(
        jnp.asarray(q), jnp.asarray([len(wa)], jnp.int32),
        jnp.asarray(t), jnp.asarray([len(wb)], jnp.int32), p, "overlap")
    score, qe, te = int(s[0]), int(qe[0]), int(te[0])
    if score <= MIN_OVERLAP:
        return 0, 0
    # overlap must sit at a-suffix / b-prefix
    qs, ts, _ = traceback(wa, wb, p, "overlap", qe, te)
    if qe < len(wa) - 2 or ts > 2:
        return 0, 0
    return len(wa) - qs, te  # consumed suffix of a, consumed prefix of b


def build_scaffolds(contigs: list[np.ndarray], names: list[str],
                    links):
    """links: rows (id1, n1, l1, dir1, id2, n2, l2, dir2, n_pairs,
    dmin, dmax, dmean) from cnt_contig_linkage (the reference -S
    connection-table schema, ScaffoldUtils.cpp:15-63). Returns
    (records, used) where records is a list of (name, codes)."""
    n = len(contigs)
    support = np.zeros(n, np.int64)
    deg = np.zeros(n, np.int64)
    for (a, _, _, _d1, b, _, _, _d2, np_, _, _, _) in links:
        support[a] += np_
        support[b] += np_
        deg[a] += 1
        deg[b] += 1
    avg = support / np.maximum(deg, 1)

    # keep strong links, sorted by support descending
    strong = [r for r in links
              if r[8] >= min(avg[r[0]], avg[r[4]])]
    strong.sort(key=lambda r: -r[8])

    nxt = {}
    prev = {}
    joins = {}
    for (a, _, _, _d1, b, _, _, _d2, np_, dmin, dmax, dmean) in strong:
        if a in nxt or b in prev:
            continue  # each node joins at most one chain on each side
        nxt[a] = b
        prev[b] = a
        joins[(a, b)] = dmean

    heads = [v for v in range(n) if v in nxt and v not in prev]
    used = set()
    records = []
    cnt = 0
    for h in heads:
        if h in used:
            continue
        chain = [h]
        used.add(h)
        while chain[-1] in nxt and nxt[chain[-1]] not in used:
            chain.append(nxt[chain[-1]])
            used.add(chain[-1])
        if len(chain) < 2:
            continue
        seq = contigs[chain[0]]
        for a, b in zip(chain, chain[1:]):
            d = joins[(a, b)]
            if d < 0:
                ov_a, ov_b = _suffix_prefix_overlap(seq, contigs[b])
                if ov_a >= MIN_OVERLAP:
                    seq = np.concatenate([seq[:len(seq) - ov_a],
                                          contigs[b]])
                    continue
                d = 10  # fall back to a small N joint
            gap = np.full(max(int(round(d)), 1), dna.N, np.int8)
            seq = np.concatenate([seq, gap, contigs[b]])
        records.append((f"scaffold_{cnt}_" +
                        "_".join(names[c] for c in chain), seq))
        cnt += 1
    singles = [i for i in range(n) if i not in used]
    for i in singles:
        records.append((names[i], contigs[i]))
    return records, used
