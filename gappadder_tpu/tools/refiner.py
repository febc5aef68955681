"""TERefiner_1 tool modes over columnar alignments (C2 inventory).

Pipeline-used modes (-U/-P/-K/-G) plus the standalone ones (-C, -L,
-B, -E, -A). Mode -S (scaffolding) lives in tools/scaffold.py; -P/-K
containment logic is ops/merge_engine.dedup_contigs.

Reference: /root/reference/TERefiner/refiner.cpp, main.cpp:56-232.
"""

from __future__ import annotations

import numpy as np

from .. import dna
from ..ops import coverage as cov_ops
from ..ops import sw_xla
from ..ops.sw_host import SWParams

READ_FULL_MAPPED_CUTOFF = 0.95  # public_parameters.h


def unique_names(names: list[str]):
    """-U gnrtUniqueFa (refiner.cpp:1045-1117): drop later contigs with
    duplicate names; returns kept indices."""
    seen = set()
    keep = []
    for i, n in enumerate(names):
        if n not in seen:
            seen.add(n)
            keep.append(i)
    return keep


def refine_by_reads(aln, contig_lens, cf_cutoff: float,
                    full_cutoff: float = READ_FULL_MAPPED_CUTOFF):
    """-C refineByReads (refiner.cpp:38-157): keep contigs whose
    fullmap/(clip+fullmap) read ratio >= cf_cutoff.

    aln: io.bam.Alignments (reads vs contigs). Returns kept indices."""
    C = len(contig_lens)
    tid = np.asarray(aln.tid)
    ok = (tid >= 0) & (tid < C)
    is_clip = ok & ((aln.lclip > 0) | (aln.rclip > 0))
    is_full = ok & ~is_clip & (aln.read_len > 0) & \
        (aln.nmatch > full_cutoff * aln.read_len)
    nclip = np.zeros(C, np.int64)
    nfull = np.zeros(C, np.int64)
    np.add.at(nclip, tid[is_clip], 1)
    np.add.at(nfull, tid[is_full], 1)
    denom = np.maximum(nclip + nfull, 1)
    ratio = nfull / denom
    return [i for i in range(C) if ratio[i] >= cf_cutoff or
            (nclip[i] + nfull[i]) == 0]


def coverage_with_cutoff(aln, contig_lens, cutoff: float):
    """-G calcCoveageWithCutoff -> per-contig mean coverage."""
    return cov_ops.coverage_with_cutoff(np.asarray(aln.tid),
                                        np.asarray(aln.nmatch),
                                        np.asarray(aln.read_len),
                                        contig_lens, cutoff)


def _cigars_of(aln):
    if getattr(aln, "cig_op", None) is not None:
        return (aln.cig_op, aln.cig_ln, aln.cig_off)
    return None


def calc_coverage(aln, contig_lens):
    """-B calcCoverage -> (mean coverage, covered length) per contig.

    Exact M-segment pileup when the BAM was read with
    keep_cigars=True (Coverage.cpp:14-141)."""
    return cov_ops.per_base_coverage(np.asarray(aln.tid),
                                     np.asarray(aln.pos),
                                     np.asarray(aln.nmatch), contig_lens,
                                     cigars=_cigars_of(aln))


def cnt_contig_linkage(aln, contig_lens, names, insert_size: int,
                       sd: int, read_length: int = 100,
                       min_support: int = 0, cov_cutoff: float = 1.0):
    """-L cntContigLinkage (refiner.cpp:1141-1304): count paired-end
    links between different contigs with orientation cases and an
    insert-size distance estimate. Vectorized over the whole BAM
    (the reference loops per contig region + per record).

    Reference semantics kept exactly:
      * only FIRST-in-pair records with both ends mapped count
        (refiner.cpp:1240-1260);
      * a pair qualifies when both inner distances
        (len1 - pos, mpos) are <= IS + 3*SD - read_length
        (:1244-1248);
      * per-side orientation from the reverse/mate-reverse flags;
        output signs: left '+'=forward, right '+'=REVERSE — the
        FR-pair convention of getUniqueContigPairs (:1509-1512);
      * distance = IS - (len1 - pos) - (mpos + read_length)
        (calcContigDistance, :1458-1463);
      * rows grouped by (contig1, contig2, dir1, dir2), kept when
        n_pairs > min_support (:1513) and the two contigs' per-base
        coverages are balanced: (max-min)/max <= cov_cutoff
        (filterByCoverage, :1537-1566).

    Returns rows (id1, name1, len1, dir1, id2, name2, len2, dir2,
    n_pairs, min_dist, max_dist, mean_dist) — the -S table schema.
    """
    C = len(contig_lens)
    lens = np.asarray(contig_lens, np.int64)
    tid = np.asarray(aln.tid)
    mtid = np.asarray(aln.mtid)
    pos = np.asarray(aln.pos).astype(np.int64)
    mpos = np.asarray(aln.mpos).astype(np.int64)
    flag = np.asarray(aln.flag)

    ok_ids = (tid >= 0) & (tid < C) & (mtid >= 0) & (mtid < C)
    both_mapped = ok_ids & ((flag & 0x4) == 0) & ((flag & 0x8) == 0)
    max_allowed = insert_size + 3 * sd - read_length
    l_inner = lens[np.clip(tid, 0, C - 1)] - pos
    qual = both_mapped & (l_inner <= max_allowed) & (mpos <= max_allowed)
    sel = qual & ((flag & 0x40) != 0) & (tid != mtid)
    if not sel.any():
        return []

    ldir = ((flag & 0x10) != 0).astype(np.int64)   # read reverse
    rdir = ((flag & 0x20) != 0).astype(np.int64)   # mate reverse
    dist = (insert_size - (lens[np.clip(tid, 0, C - 1)] - pos)
            - (mpos + read_length)).astype(np.float64)

    key = (((tid.astype(np.int64) * C + mtid) * 2 + ldir) * 2 + rdir)[sel]
    d = dist[sel]
    order = np.argsort(key, kind="stable")
    key, d = key[order], d[order]
    uniq, starts = np.unique(key, return_index=True)
    ends = np.append(starts[1:], len(key))

    # coverage-balance filter uses -B per-base coverage of each contig
    cov, _ = cov_ops.per_base_coverage(
        tid, np.asarray(aln.pos), np.asarray(aln.nmatch), contig_lens)

    rows = []
    for u, s, e in zip(uniq, starts, ends):
        n = int(e - s)
        if n <= min_support:
            continue
        rd = int(u % 2)
        ld = int((u // 2) % 2)
        b = int((u // 4) % C)
        a = int(u // (4 * C))
        big, small = max(cov[a], cov[b]), min(cov[a], cov[b])
        if not (big > 0.0 and (big - small) / big <= cov_cutoff):
            continue
        ds = d[s:e]
        rows.append((a, names[a], int(lens[a]), "-" if ld else "+",
                     b, names[b], int(lens[b]), "+" if rd else "-",
                     n, float(ds.min()), float(ds.max()),
                     float(ds.mean())))
    return rows


def classify_repeat(seq_a: np.ndarray, seq_b: np.ndarray):
    """-A RepeatsClassifier (RepeatsClassifier.cpp): is b the same
    repeat as a, forward or reverse-complement? Returns
    ('forward'|'reverse'|'none', fwd_score, rc_score)."""
    import jax.numpy as jnp
    p = SWParams(1, -1, 2, 1)
    L = max(len(seq_a), len(seq_b))
    qa = np.full((2, L), dna.N, np.int8)
    ta = np.full((2, L), dna.N, np.int8)
    qa[0, :len(seq_a)] = seq_a
    qa[1, :len(seq_a)] = dna.revcomp(seq_a)
    ta[0, :len(seq_b)] = seq_b
    ta[1, :len(seq_b)] = seq_b
    ql = np.full(2, len(seq_a), np.int32)
    tl = np.full(2, len(seq_b), np.int32)
    s, _, _ = sw_xla.sw_batch(jnp.asarray(qa), jnp.asarray(ql),
                              jnp.asarray(ta), jnp.asarray(tl), p, "local")
    fwd, rc = int(s[0]), int(s[1])
    thr = 0.8 * min(len(seq_a), len(seq_b))
    if max(fwd, rc) < thr:
        return "none", fwd, rc
    return ("forward" if fwd >= rc else "reverse"), fwd, rc


def evaluate_with_benchmark(aln, bench_lens, cutoff: float = 0.9):
    """-E evaluateWithBenchmark (refiner.cpp:832-1043): how well do
    assembled contigs cover the benchmark sequences?

    aln: contigs aligned TO the benchmark. Returns dict with counts of
    benchmark seqs covered >= cutoff and per-seq coverage."""
    mean_cov, covered = cov_ops.per_base_coverage(
        np.asarray(aln.tid), np.asarray(aln.pos),
        np.asarray(aln.nmatch), bench_lens, cigars=_cigars_of(aln))
    frac = covered / np.maximum(np.asarray(bench_lens, np.int64), 1)
    return {
        "covered_frac": frac,
        "n_covered": int((frac >= cutoff).sum()),
        "mean_coverage": mean_cov,
    }
