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


def _cigar_stats(aln):
    """Per-record CIGAR reductions: (n_ops, first_op, first_ln, m_sum,
    mshi_sum). Requires read_bam(keep_cigars=True)."""
    if getattr(aln, "cig_op", None) is None:
        raise ValueError("BAM must be read with keep_cigars=True for "
                         "exact TERefiner mode parity")
    op = np.asarray(aln.cig_op)
    ln = np.asarray(aln.cig_ln, np.int64)
    off = np.asarray(aln.cig_off, np.int64)
    n = len(off) - 1
    n_ops = (off[1:] - off[:-1]).astype(np.int64)
    first_op = np.full(n, -1, np.int64)
    first_ln = np.zeros(n, np.int64)
    has = n_ops > 0
    first_op[has] = op[off[:-1][has]]
    first_ln[has] = ln[off[:-1][has]]
    # segment ids: which record each flat op belongs to
    seg = np.repeat(np.arange(n), n_ops)
    m_sum = np.zeros(n, np.int64)
    np.add.at(m_sum, seg[op == 0], ln[op == 0])          # 'M' only
    shi = (op == 4) | (op == 5) | (op == 1)              # S, H, I
    shi_sum = np.zeros(n, np.int64)
    np.add.at(shi_sum, seg[shi], ln[shi])
    return n_ops, first_op, first_ln, m_sum, m_sum + shi_sum


def fully_mapped_mask(aln, qlens, cutoff: float):
    """Alignment::isFullyMapped (Alignment.cpp:397-425) per record.

    True when the CIGAR is a single M op of length <= the query contig
    length, or when sum(M) / sum(M+S+H+I) > cutoff (strict; an empty
    denominator is false — the C++ NaN comparison)."""
    n_ops, first_op, first_ln, m_sum, tot = _cigar_stats(aln)
    qlens = np.asarray(qlens, np.int64)
    single_m = (n_ops == 1) & (first_op == 0) & (first_ln <= qlens)
    frac = (tot > 0) & (m_sum > cutoff * tot)
    return single_m | frac


def perfect_mapped_mask(aln, qlens):
    """Alignment::isPerfectMapped (Alignment.cpp:428-437): CIGAR is
    exactly one M op spanning the full query contig length."""
    n_ops, first_op, first_ln, _, _ = _cigar_stats(aln)
    return (n_ops == 1) & (first_op == 0) & \
        (first_ln == np.asarray(qlens, np.int64))


def _fai_maps(fai_names, fai_lens):
    idx = {}
    for i, nm in enumerate(fai_names):
        idx[nm] = i  # map semantics: later duplicate name overwrites
    lens = np.asarray(fai_lens, np.int64)
    return idx, lens


def _decode_names(aln):
    if aln.names is None:
        raise ValueError("BAM must be read with keep_names=True for "
                         "exact TERefiner mode parity")
    return [nm.decode() if isinstance(nm, bytes) else nm
            for nm in aln.names]


def remove_dup_contigs(aln, fai_names, fai_lens, cutoff: float,
                       rm_contained: bool = False):
    """-P removeDupRepeatsOfOneContigSet (refiner.cpp:660-801) over a
    contig-vs-self BAM: returns kept fai indices.

    Without -g (rm_contained=False): a fully-mapped query with
    qname > rname is dropped when the two lengths are equal or their
    difference ratio <= 1-cutoff. With -g: a *perfectly* mapped query
    (single full-length M) hitting a different contig is dropped."""
    idx, lens = _fai_maps(fai_names, fai_lens)
    names = _decode_names(aln)
    qid = np.array([idx.get(nm, 0) for nm in names], np.int64)
    qlen = lens[qid] * np.array([nm in idx for nm in names], np.int64)
    tid = np.asarray(aln.tid, np.int64)
    ok_tid = (tid >= 0) & (tid < len(fai_names))
    if rm_contained:
        mask = perfect_mapped_mask(aln, qlen)
        rm = set()
        for i in np.nonzero(mask & ok_tid)[0]:
            if names[i] != fai_names[tid[i]]:
                rm.add(int(qid[i]))
    else:
        mask = fully_mapped_mask(aln, qlen, cutoff)
        rm = set()
        for i in np.nonzero(mask & ok_tid)[0]:
            qname, rname = names[i], fai_names[tid[i]]
            if not qname > rname:
                continue
            iq, ir = int(qlen[i]), int(lens[idx[rname]])
            if iq == ir:
                rm.add(int(qid[i]))
            else:
                idiff, imin = abs(iq - ir), min(iq, ir)
                if imin > 0 and idiff / imin <= 1.0 - cutoff:
                    rm.add(int(qid[i]))
    return [i for i in range(len(fai_names)) if i not in rm]


def remove_repeats_two_sets(aln, query_fai_names, query_fai_lens,
                            cutoff: float):
    """-T removeRepeatsOfTwoContigSets (refiner.cpp:300-392): the BAM
    aligns the QUERY contig set (the reference's `-s bam_fasta`) onto a
    separate reference contig set; ANY query whose record is fully
    mapped (M-fraction > cutoff against the query's own fai length) is
    removed from the query set. Deliberately ASYMMETRIC: the reference
    set is untouched and relative lengths play no role — a long query
    fully mapping onto a short reference contig is still dropped.
    Returns kept query fai indices."""
    idx, lens = _fai_maps(query_fai_names, query_fai_lens)
    names = _decode_names(aln)
    known = np.array([nm in idx for nm in names], bool)
    qid = np.array([idx.get(nm, 0) for nm in names], np.int64)
    qlen = lens[qid] * known
    mask = fully_mapped_mask(aln, qlen, cutoff)
    tid = np.asarray(aln.tid, np.int64)
    rm = {int(qid[i]) for i in np.nonzero(mask & known & (tid >= 0))[0]}
    return [i for i in range(len(query_fai_names)) if i not in rm]


def remove_repeats_one_set(aln, fai_names, fai_lens, cutoff: float):
    """-O removeRepeatsOfOneContigSet (refiner.cpp:482-585) over a
    contig-vs-self BAM: a query fully mapped onto a DIFFERENT contig is
    removed — unconditionally when the two lengths differ (even when
    the query is the LONGER one: the reference's `else` branch drops
    qname regardless), and only when qname < rname when the lengths are
    equal (so exactly one of a same-length pair survives). Returns kept
    fai indices."""
    idx, lens = _fai_maps(fai_names, fai_lens)
    names = _decode_names(aln)
    known = np.array([nm in idx for nm in names], bool)
    qid = np.array([idx.get(nm, 0) for nm in names], np.int64)
    qlen = lens[qid] * known
    mask = fully_mapped_mask(aln, qlen, cutoff)
    tid = np.asarray(aln.tid, np.int64)
    ok_tid = (tid >= 0) & (tid < len(fai_names))
    rm = set()
    for i in np.nonzero(mask & known & ok_tid)[0]:
        qname, rname = names[i], fai_names[tid[i]]
        if qname == rname:
            continue
        iq, ir = int(qlen[i]), int(lens[idx[rname]])
        if iq == ir:
            if qname < rname:
                rm.add(int(qid[i]))
        else:
            rm.add(int(qid[i]))
    return [i for i in range(len(fai_names)) if i not in rm]


def remove_contained_contigs(aln, fai_names, fai_lens, cutoff: float):
    """-K removeContainedContigs (refiner.cpp:587-657): drop any query
    contig fully mapped (M-fraction > cutoff) onto a different contig;
    returns kept fai indices."""
    idx, lens = _fai_maps(fai_names, fai_lens)
    names = _decode_names(aln)
    qid = np.array([idx.get(nm, 0) for nm in names], np.int64)
    qlen = lens[qid] * np.array([nm in idx for nm in names], np.int64)
    tid = np.asarray(aln.tid, np.int64)
    ok_tid = (tid >= 0) & (tid < len(fai_names))
    mask = fully_mapped_mask(aln, qlen, cutoff)
    rm = set()
    for i in np.nonzero(mask & ok_tid)[0]:
        if names[i] != fai_names[tid[i]]:
            rm.add(int(qid[i]))
    return [i for i in range(len(fai_names)) if i not in rm]


def coverage_with_cutoff_exact(aln, contig_lens, cutoff: float,
                               read_length: int):
    """-G calcCoveageWithCutoff, binary-exact
    (refiner.cpp:1381-1451 + Coverage.cpp:144-185): per contig, sum
    M-bases of primary, non-duplicate, QC-pass reads whose
    M-sum / READ_LENGTH >= cutoff, divided by the contig length.

    Unlike ``coverage_with_cutoff`` the denominator of the read filter
    is the global -l READ_LENGTH parameter, not each record's length."""
    C = len(contig_lens)
    _, _, _, m_sum, _ = _cigar_stats(aln)
    tid = np.asarray(aln.tid, np.int64)
    flag = np.asarray(aln.flag, np.int64)
    ok = (tid >= 0) & (tid < C) & ((flag & 0x400) == 0) & \
        ((flag & 0x100) == 0) & ((flag & 0x200) == 0) & \
        (m_sum >= cutoff * read_length)
    total = np.zeros(C, np.int64)
    np.add.at(total, tid[ok], m_sum[ok])
    lens = np.asarray(contig_lens, np.float64)
    return np.where(lens > 0, total / np.maximum(lens, 1), 0.0)


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
    benchmark seqs covered >= cutoff, per-seq coverage, and the
    binary's .statistic.table.txt row fields: total_covered (bases hit
    at least once), total_mapped_bases (pileup mass over covered
    bases), longest_single (max full M-sum among records whose
    M-sum / ref_len >= cutoff — the reference takes the full CIGAR M
    count even when the pileup clips at the contig end, and applies NO
    flag filters in this mode)."""
    lens = np.asarray(bench_lens, np.int64)
    mean_cov, covered = cov_ops.per_base_coverage(
        np.asarray(aln.tid), np.asarray(aln.pos),
        np.asarray(aln.nmatch), bench_lens, cigars=_cigars_of(aln))
    frac = covered / np.maximum(lens, 1)
    C = len(lens)
    tid = np.asarray(aln.tid, np.int64)
    if getattr(aln, "cig_op", None) is not None:
        _, _, _, m_sum, _ = _cigar_stats(aln)
    else:
        m_sum = np.asarray(aln.nmatch, np.int64)
    ok = (tid >= 0) & (tid < C) & ((np.asarray(aln.flag) & 4) == 0) & \
        (m_sum >= cutoff * lens[np.clip(tid, 0, C - 1)])
    longest = np.zeros(C, np.int64)
    np.maximum.at(longest, tid[ok], m_sum[ok])
    return {
        "covered_frac": frac,
        "n_covered": int((frac >= cutoff).sum()),
        "mean_coverage": mean_cov,
        "total_covered": covered,
        "total_mapped_bases": np.rint(mean_cov * lens).astype(np.int64),
        "longest_single": longest,
    }
