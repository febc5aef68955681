"""Contig dedup + overlap-graph merge — the TERefiner(-U/-P/-K) and
ContigsMerger replacement (L2).

Per gap (batched across a gap list; all DP scoring on device):

DEDUP (Refiner.removeDupRepeatsOfOneContigSet / removeContainedContigs,
/root/reference/TERefiner/refiner.cpp:587-801):
  exact duplicates dropped by content hash; near-duplicate/contained
  contigs found by sketch-pruned local SW — a contig whose best local
  alignment onto another covers >= `cutoff` of its length is dropped
  when the other is longer (containment) or has a smaller index
  (duplicate tie-break, the reference's qname>rname order).

MERGE (ContigsCompactor::CompactVer3,
/root/reference/ContigsCompactor-v0.2.0/ContigsMerger/ContigsCompactor.cpp:773-983):
  1. revcomp twin per contig;
  2. quick-check: pairs sharing >= min_support 10-mers between A's tail
     window and B's head window (QuickCheckerContigsMatch, :1982-2096)
     — here a hashed-bitset intersection;
  3. overlap DP (Evaluate, :1572-1874): match +1, mismatch/indel -2
     (the pipeline's -i1 -2 -i2 -2), free end gaps, ends scanned with
     up to maxOverlapClipLen=50 slack -> the SW kernel's overlap mode
     with end_slack;
  4. IsScoreSignificant (:1876-1976): overlap >= min frac / len,
     >= 5 bp extension (containment rejected), score >=
     overlap*(1-fracScoreLoss);
  5. digraph of A->B edges weighted -overlap; Tarjan SCC condensation
     gives the topological rank (GraphUtils.cpp:1028-1073); path roots/
     ends are nodes with no cross-SCC incoming/outgoing edges
     (FindSimplePathsTopSortStart, :1258-1340); per root, a min-weight
     (= max total overlap) path DP over rank order ignoring back-edges
     yields one path per (root, end) pair (FindSimplePathsTopSortFrom,
     :774-860); per root the longest-by-node-count paths are kept
     (FindSimplePathsTopSort, :625-771);
  6. path splicing: merged = A[:qstart] + B at each edge (the
     reference's traceback keeps seq2's characters in the overlap);
  7. revcomp-duplicate merged paths removed (RemoveDupRevCompPaths).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import dna
from ..utils import log
from . import sw_host
from .sw_host import SWParams

MERGE_PARAMS = SWParams(match=1, mismatch=-2, gap_open=2, gap_extend=2)
SKETCH_WORDS = 64                   # 2048-bit 10-mer sketch


@dataclasses.dataclass(frozen=True)
class MergeConfig:
    frac_score_loss: float = 0.4    # -s
    min_frac_overlap: float = 0.005  # -c default
    min_overlap_len: int = 12       # -x
    max_clip_len: int = 50          # -y
    min_overlap_len_scaffold: int = 6  # -z default
    kmer_len: int = 10              # -k
    min_support_kmer: int = 1       # -m
    window: int = 1000              # quick-check end-window size
    max_paths_per_gap: int = 32
    max_path_nodes: int = 64        # MAX_CONTIGS_IN_PATH analog
    dedup_cutoff: float = 0.99      # MergeContigs.py:73-99
    # DP-bill bounds on fragmented inputs (warn loudly when they bite;
    # the reference pays the full O(n^2) pair DP instead)
    max_candidates: int = 2048
    max_out_edges: int = 4


def _kmer_hashes(seq: np.ndarray, k: int) -> np.ndarray:
    """Rolling k-mer hash values (host, vectorized)."""
    s = np.asarray(seq, np.uint64)
    n = len(s) - k + 1
    if n <= 0:
        return np.zeros(0, np.uint64)
    h = np.zeros(n, np.uint64)
    for j in range(k):
        h = h * np.uint64(1099511628211) + s[j:j + n] + np.uint64(1)
    return h


def _sketch(seq: np.ndarray, k: int) -> np.ndarray:
    """Bitset sketch of a sequence's k-mer hash set."""
    h = _kmer_hashes(seq, k) % np.uint64(SKETCH_WORDS * 32)
    out = np.zeros(SKETCH_WORDS, np.uint32)
    np.bitwise_or.at(out, (h // 32).astype(np.int64),
                     (np.uint32(1) << (h % 32).astype(np.uint32)))
    return out


def _shared_kmers(sk_a: np.ndarray, sk_b: np.ndarray) -> int:
    return int(np.bitwise_count(sk_a & sk_b).sum())


def _shared_matrix(sk_a: np.ndarray, sk_b: np.ndarray) -> np.ndarray:
    """Pairwise shared-bit counts: [A, W]uint32 x [B, W] -> [A, B].

    Word-level popcount in row blocks (32x less data than the old
    unpackbits bit-matrix product; blocks bound peak memory)."""
    A, W = sk_a.shape
    B = sk_b.shape[0]
    out = np.empty((A, B), np.int32)
    step = max(1, (1 << 24) // max(B * W, 1))
    for i in range(0, A, step):
        blk = sk_a[i:i + step, None, :] & sk_b[None, :, :]
        out[i:i + step] = np.bitwise_count(blk).sum(axis=2,
                                                    dtype=np.int32)
    return out


def _sw_batch_np(queries, targets, mode, params, end_slack=0):
    """Run a ragged list of (q, t) pairs through the device kernel."""
    from .swutil import sw_ragged
    return sw_ragged(queries, targets, params, mode, end_slack=end_slack)


def dedup_contigs(contigs: list[np.ndarray], cfg: MergeConfig):
    """Indices of contigs to KEEP after duplicate/containment removal."""
    n = len(contigs)
    if n <= 1:
        return list(range(n))
    # exact dups
    seen: dict[bytes, int] = {}
    keep = [True] * n
    for i, c in enumerate(contigs):
        key = c.tobytes()
        rkey = dna.revcomp(c).tobytes()
        if key in seen or rkey in seen:
            keep[i] = False
        else:
            seen[key] = i
    # sketch-pruned near-dup / containment (vectorized pair screen)
    sketches = np.stack([_sketch(c, cfg.kmer_len) for c in contigs])
    shared = _shared_matrix(sketches, sketches)
    lens = np.array([len(c) for c in contigs])
    keep_arr = np.array(keep)
    need = np.minimum(np.maximum(
        (0.5 * np.minimum(lens, cfg.window) - cfg.kmer_len), 1), 32)
    cand = (shared >= need[:, None]) & keep_arr[:, None] & keep_arr[None, :] \
        & (lens[:, None] <= lens[None, :]) & \
        ~np.eye(n, dtype=bool)
    pairs = [(int(i), int(j)) for i, j in zip(*np.nonzero(cand))]
    if pairs:
        qs = [contigs[i] for i, _ in pairs]
        ts = [contigs[j] for _, j in pairs]
        # check both strands: query vs target and revcomp
        s1, _, _ = _sw_batch_np(qs, ts, "local", SWParams(1, -4, 7, 1))
        rs = [dna.revcomp(q) for q in qs]
        s2, _, _ = _sw_batch_np(rs, ts, "local", SWParams(1, -4, 7, 1))
        for (i, j), sc1, sc2 in zip(pairs, s1, s2):
            if not (keep[i] and keep[j]):
                continue
            sc = max(sc1, sc2)
            li, lj = len(contigs[i]), len(contigs[j])
            if sc >= cfg.dedup_cutoff * li:
                if li < lj:                 # contained (-K)
                    keep[i] = False
                elif lj * (1.0 - cfg.dedup_cutoff) >= abs(li - lj) and i > j:
                    keep[i] = False         # near-dup (-P), drop higher idx
    return [i for i in range(n) if keep[i]]


def _significant(score, qlen, tlen, qe, te, cfg: MergeConfig):
    """IsScoreSignificant + edge direction; returns None or
    ('12'|'21', overlap_len)."""
    c1 = qlen - qe
    c2 = tlen - te
    nclip = min(c1, c2)
    if nclip > cfg.max_clip_len:
        return None
    ov0 = min(qlen, tlen)
    ov1 = te if c1 <= c2 else ov0      # row end hit: overlap = colStart
    ov2 = qe if c2 <= c1 else ov0
    ov = min(ov0, ov1, ov2)
    if ov < qlen * cfg.min_frac_overlap and ov < tlen * cfg.min_frac_overlap:
        return None
    # containment rejection (>=5bp extension required)
    if c1 <= c2 and te + 5 - 1 >= tlen:
        return None
    if c2 <= c1 and qe + 5 - 1 >= qlen:
        return None
    if score < ov * (1.0 - cfg.frac_score_loss):
        return None
    if ov < cfg.min_overlap_len:       # < -x: not a contig-contig merge
        return None
    # direction: suffix of seq1 onto prefix of seq2 => A then B
    if c1 <= c2:
        return ("12", ov)
    return ("21", ov)


def merge_contigs(contigs: list[np.ndarray], cfg: MergeConfig):
    """Returns (merged list of np arrays, info list of node-index paths).

    Node space: 0..n-1 forward contigs, n..2n-1 revcomp twins.
    """
    n = len(contigs)
    if n == 0:
        return [], []
    nodes = list(contigs) + [dna.revcomp(c) for c in contigs]
    N = len(nodes)
    k = cfg.kmer_len
    heads = np.stack([_sketch(s[:cfg.window], k) for s in nodes])
    tails = np.stack([_sketch(s[-cfg.window:], k) for s in nodes])
    shared = _shared_matrix(tails, heads)
    same = np.arange(N)[:, None] % n == np.arange(N)[None, :] % n
    cmat = (shared >= cfg.min_support_kmer) & ~same
    cand = [(int(a), int(b)) for a, b in zip(*np.nonzero(cmat))]
    if not cand:
        return [], []
    # bound the DP bill on fragmented inputs: keep the highest-support
    # candidates (deterministic: support desc, then pair index)
    if len(cand) > cfg.max_candidates:
        log.warn_cap(
            "merge_candidates_truncated",
            "overlap-candidate screen kept %d of %d pairs "
            "(max_candidates); lowest k-mer-support pairs dropped",
            cfg.max_candidates, len(cand))
        cand.sort(key=lambda ab: (-int(shared[ab[0], ab[1]]), ab))
        cand = sorted(cand[:cfg.max_candidates])

    qs = [nodes[a] for a, _ in cand]
    ts = [nodes[b] for _, b in cand]
    s, qe, te = _sw_batch_np(qs, ts, "overlap", MERGE_PARAMS,
                             end_slack=cfg.max_clip_len)

    raw_edges = {}
    for (a, b), sc, q_e, t_e in zip(cand, s, qe, te):
        sig = _significant(int(sc), len(nodes[a]), len(nodes[b]),
                           int(q_e), int(t_e), cfg)
        if sig is None:
            continue
        mode, ov = sig
        key = (a, b) if mode == "12" else (b, a)
        if key not in raw_edges or ov > raw_edges[key][0]:
            raw_edges[key] = (ov, mode, int(q_e), int(t_e), a, b)
    if not raw_edges:
        return [], []

    # keep only the best few outgoing edges per node before paying for
    # host tracebacks (fragmented inputs otherwise create dense graphs)
    by_src: dict[int, list] = {}
    for (u, v), info in raw_edges.items():
        by_src.setdefault(u, []).append((info[0], v, info))
    edges = {}
    for u, lst in by_src.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        if len(lst) > cfg.max_out_edges:
            log.warn_cap(
                "merge_out_edges_truncated",
                "merge graph node kept %d of %d outgoing overlap edges "
                "(max_out_edges); smallest overlaps dropped",
                cfg.max_out_edges, len(lst))
        for ov, v, (o, mode, q_e, t_e, a, b) in lst[:cfg.max_out_edges]:
            if mode == "12":
                qstart, _, _ = sw_host.alignment_stats(
                    nodes[a], nodes[b], MERGE_PARAMS, "overlap", q_e, t_e)
                edges[(u, v)] = (o, qstart)
            else:
                tstart = sw_host.traceback(nodes[a], nodes[b], MERGE_PARAMS,
                                           "overlap", q_e, t_e)[1]
                edges[(u, v)] = (o, tstart)

    if not edges:
        return [], []

    paths = enumerate_paths(N, edges, cfg)

    def splice(p):
        """Merged sequence: at each edge keep the upstream prefix up to
        the overlap start, then all of the downstream contig (the
        reference keeps seq2's characters in the overlap,
        FormMergedSeqFromPath, ContigsCompactor.cpp:1456-1515)."""
        seq = nodes[p[0]]
        for a, b in zip(p, p[1:]):
            _, qstart = edges[(a, b)]
            offset = len(seq) - len(nodes[a])  # a is the suffix of seq
            seq = np.concatenate([seq[:offset + qstart], nodes[b]])
        return seq

    merged, infos, seen = [], [], set()
    for path in paths:
        if len(merged) >= cfg.max_paths_per_gap:
            log.warn_cap(
                "merge_paths_truncated",
                "max_paths_per_gap=%d reached; %d merged path(s) "
                "dropped", cfg.max_paths_per_gap, len(paths) - len(merged))
            break
        seq = splice(path)
        key = min(seq.tobytes(), dna.revcomp(seq).tobytes())
        if key in seen:      # sequence-level safety net on top of the
            continue         # path-level RemoveDupRevCompPaths
        seen.add(key)
        merged.append(seq)
        infos.append(list(path))
    return merged, infos


def _tarjan_scc(N: int, adj: dict[int, list[int]]) -> list[list[int]]:
    """Iterative Tarjan; SCCs returned in TOPOLOGICAL order of the
    condensation (the reference reverses Tarjan's output,
    GraphUtils.cpp:1060-1065)."""
    index = {}
    low = {}
    on_stack = set()
    stack: list[int] = []
    sccs: list[list[int]] = []
    counter = [0]
    for root in range(N):
        if root in index:
            continue
        # explicit DFS stack: (node, iterator position)
        work = [(root, 0)]
        while work:
            u, pi = work[-1]
            if pi == 0:
                index[u] = low[u] = counter[0]
                counter[0] += 1
                stack.append(u)
                on_stack.add(u)
            nbrs = adj.get(u, ())
            advanced = False
            while pi < len(nbrs):
                v = nbrs[pi]
                pi += 1
                if v not in index:
                    work[-1] = (u, pi)
                    work.append((v, 0))
                    advanced = True
                    break
                if v in on_stack:
                    low[u] = min(low[u], index[v])
            if advanced:
                continue
            work.pop()
            if low[u] == index[u]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == u:
                        break
                sccs.append(sorted(comp))
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[u])
    sccs.reverse()
    return sccs


# per-root path-count limit (MAX_CONTIG_IN_PATH_COUNT = 20,
# ContigsCompactor.cpp:34; the reference's loop emits max+1 paths —
# kept faithfully)
MAX_PATHS_PER_ROOT = 20


def enumerate_paths(N: int, edges: dict, cfg: MergeConfig):
    """FindSimplePathsTopSort parity (GraphUtils.cpp:625-771).

    Returns deduped node-index paths (len >= 2), reference semantics:
    SCC-condensation rank; roots = nodes with no cross-SCC incoming
    edge / ends = none outgoing (multi-node SCCs keep at most one
    representative, :1299-1340); per root a min-weight DP over rank
    order with edge weight -overlap (back-edges ignored) gives one
    path per reachable end; per root the longest-by-node-count are
    kept. Single-node paths (isolated roots) are skipped — the
    reference emits them but its own dedup pass immediately removes
    them again.
    """
    adj: dict[int, list[int]] = {}
    radj: dict[int, list[int]] = {}
    for (a, b) in edges:
        adj.setdefault(a, []).append(b)
        radj.setdefault(b, []).append(a)
    for lst in adj.values():
        lst.sort()

    sccs = _tarjan_scc(N, adj)
    scc_of = {}
    rank = {}
    r = 0
    for ci, comp in enumerate(sccs):
        for v in comp:
            scc_of[v] = ci
            rank[v] = r
            r += 1
    order = sorted(range(N), key=lambda v: rank[v])

    def candidates(start: bool) -> list[int]:
        cand = set(range(N))
        for u in range(N):
            for v in adj.get(u, ()):
                if scc_of[u] != scc_of[v]:
                    cand.discard(v if start else u)
        # multi-node SCCs: keep one representative only if the whole
        # SCC survived, else none (GraphUtils.cpp:1299-1340)
        for comp in sccs:
            if len(comp) <= 1:
                continue
            all_in = all(v in cand for v in comp)
            keep = comp[0] if start else comp[-1]
            for v in comp:
                if v != keep or not all_in:
                    cand.discard(v)
        return sorted(cand, key=lambda v: rank[v])

    roots = candidates(True)
    ends = candidates(False)
    end_set = set(ends)

    INF = float("inf")
    all_paths: list[tuple[int, ...]] = []
    seen_paths: set[tuple[int, ...]] = set()
    for root in roots:
        dist = {v: INF for v in range(N)}
        path: dict[int, tuple[int, ...]] = {root: (root,)}
        dist[root] = 0.0
        for u in order:
            if rank[u] < rank[root] or dist[u] >= INF:
                continue
            for v in adj.get(u, ()):
                if rank[v] < rank[u]:
                    continue  # back-edge within/into an earlier SCC
                if len(path[u]) >= cfg.max_path_nodes:
                    continue
                w = -float(edges[(u, v)][0])   # weight = -overlap
                if dist[u] + w < dist[v]:
                    dist[v] = dist[u] + w
                    path[v] = path[u] + (v,)
        found = [path[e] for e in ends
                 if dist[e] < INF and len(path[e]) > 1]
        found.sort(key=lambda p: (-len(p), p))
        for num_out, p in enumerate(found):
            if num_out > MAX_PATHS_PER_ROOT:
                break
            if p not in seen_paths:
                seen_paths.add(p)
                all_paths.append(p)

    # RemoveDupRevCompPaths (ContigsCompactor.cpp:1422-1454): drop a
    # path when its twin-reversed image is also present and ordered
    # strictly before it
    n = N // 2

    def rc_path(p):
        return tuple((v + n) % (2 * n) for v in reversed(p))

    ordered = sorted(all_paths)
    pos = {p: i for i, p in enumerate(ordered)}
    out = []
    for p in ordered:
        q = rc_path(p)
        if q in pos and pos[q] < pos[p]:
            continue
        out.append(p)
    return out
