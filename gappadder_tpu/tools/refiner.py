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


def calc_coverage(aln, contig_lens):
    """-B calcCoverage -> (mean coverage, covered length) per contig."""
    return cov_ops.per_base_coverage(np.asarray(aln.tid),
                                     np.asarray(aln.pos),
                                     np.asarray(aln.nmatch), contig_lens)


def cnt_contig_linkage(aln, contig_lens, names, insert_size: int,
                       sd: int, min_mapq: int = 0):
    """-L cntContigLinkage (refiner.cpp:1141-1304): count paired-end
    links between different contigs with an insert-size-based distance
    estimate.

    Returns rows (id1, name1, len1, id2, name2, len2, n_pairs,
    min_dist, max_dist, mean_dist) — the -S connection-table schema.
    """
    C = len(contig_lens)
    tid = np.asarray(aln.tid)
    mtid = np.asarray(aln.mtid)
    sel = (tid >= 0) & (mtid >= 0) & (tid < C) & (mtid < C) & \
        (tid != mtid) & (np.asarray(aln.mapq) >= min_mapq) & \
        ((np.asarray(aln.flag) & 0x4) == 0) & \
        ((np.asarray(aln.flag) & 0x8) == 0)
    stats: dict[tuple[int, int], list[int]] = {}
    lens = np.asarray(contig_lens)
    pos = np.asarray(aln.pos)
    for i in np.nonzero(sel)[0]:
        a, b = int(tid[i]), int(mtid[i])
        key = (a, b) if a < b else (b, a)
        # estimated spanned distance: insert minus the anchored parts
        d = insert_size - (int(lens[a]) - int(pos[i]))
        stats.setdefault(key, []).append(d)
    rows = []
    for (a, b), ds in sorted(stats.items()):
        rows.append((a, names[a], int(lens[a]), b, names[b], int(lens[b]),
                     len(ds), int(min(ds)), int(max(ds)),
                     float(np.mean(ds))))
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
        np.asarray(aln.nmatch), bench_lens)
    frac = covered / np.maximum(np.asarray(bench_lens, np.int64), 1)
    return {
        "covered_frac": frac,
        "n_covered": int((frac >= cutoff).sum()),
        "mean_coverage": mean_cov,
    }
