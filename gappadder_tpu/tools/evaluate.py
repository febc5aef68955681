"""Evaluation machinery — the reference's golden-truth benchmark
scripts (P14/P3-eval: gnrt_gap_seqs, statistic_rslt.py,
discordant_alignment_statistic.py).

Given a FINISHED genome for the same organism, extract each gap's
"true" sequence by locating the gap flanks in the finished assembly
(gnrt_pos_true_seqs.py:120-188), then score closures: a picked fill
counts as CLOSED when it aligns to the truth without >= 20 bp clipping
on either side (statistic_rslt.py:80-127 -> hit_list.txt,
closed_gap_length.txt).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import dna
from ..io import fasta
from ..ops import sw_xla
from ..ops.sw_host import BWA_PARAMS, alignment_stats

CLIP_CUTOFF = 20     # statistic_rslt.py is_qualified_clipped cutoff
FLANK_CLIP_CUTOFF = 10  # gnrt_gap_seqs uses 10 for flank placement


def _best_placement(query: np.ndarray, genome: fasta.Genome):
    """Best local alignment of query against every scaffold (both
    strands). Returns (scaf, strand, tstart, tend, qstart, qend,
    score) or None. O(|genome| x |query|): only used as the fallback
    for queries the seeded path cannot anchor (and for tiny genomes);
    the production path is seeded_placements below."""
    best = None
    for si in range(genome.num_scaffolds):
        t = genome.scaffold(si)
        if len(t) == 0:
            continue
        for strand, q in ((0, query), (1, dna.revcomp(query))):
            L = max(len(q), 8)
            qa = np.full((1, L), dna.N, np.int8)
            qa[0, :len(q)] = q
            ta = np.full((1, max(len(t), 8)), dna.N, np.int8)
            ta[0, :len(t)] = t
            s, qe, te = sw_xla.sw_batch(
                jnp.asarray(qa), jnp.asarray([len(q)], jnp.int32),
                jnp.asarray(ta), jnp.asarray([len(t)], jnp.int32),
                BWA_PARAMS, "local")
            sc = int(s[0])
            if best is None or sc > best[6]:
                qs, ts, _ = alignment_stats(q, t, BWA_PARAMS, "local",
                                            int(qe[0]), int(te[0]))
                best = (si, strand, ts, int(te[0]), qs, int(qe[0]), sc)
    return best


# full-DP fallback is affordable below this finished-genome size
_FALLBACK_GENOME_LIMIT = 1 << 20
_SEED_PAD = 64


def seeded_placements(queries, genome: fasta.Genome, index=None):
    """Scalable batched placement: minimizer seeding locates each
    query's window (ops/minimap.py), then one batched local DP over the
    padded windows — O(|query| x window) instead of the full-genome DP
    the reference effectively runs (statistic_rslt.py:8-25 shells one
    `bwa mem` per gap; _best_placement above is the literal-DP analog).

    queries: list of code arrays. Returns list of placement tuples
    (scaf, strand, tstart, tend, qstart, qend, score) or None, same
    semantics as _best_placement.
    """
    from ..ops import minimap

    if index is None:
        index = minimap.build_index(genome)
    n = len(queries)
    out = [None] * n
    if n == 0:
        return out
    Lmax = max(max(len(q) for q in queries), 8)
    qa = np.full((n, Lmax), dna.N, np.int8)
    ql = np.zeros(n, np.int32)
    for i, q in enumerate(queries):
        qa[i, :len(q)] = q
        ql[i] = len(q)
    pl = minimap.map_reads(genome, index, qa, ql, min_score=20)

    idx_hit = [i for i in range(n) if pl.gstart[i] >= 0]
    if idx_hit:
        W = Lmax + 2 * _SEED_PAD
        tw = np.full((len(idx_hit), W), dna.N, np.int8)
        tl = np.zeros(len(idx_hit), np.int32)
        meta = []
        for j, i in enumerate(idx_hit):
            si = int(genome.scaffold_index(np.asarray([pl.gstart[i]]))[0])
            t = genome.scaffold(si)
            loc = int(pl.gstart[i] - genome.offsets[si])
            ws = max(0, loc - int(pl.lclip[i]) - _SEED_PAD)
            we = min(len(t), ws + W)
            tw[j, :we - ws] = t[ws:we]
            tl[j] = we - ws
            meta.append((i, si, ws))
        qb = np.full((len(idx_hit), Lmax), dna.N, np.int8)
        for j, i in enumerate(idx_hit):
            q = queries[i]
            qb[j, :len(q)] = (dna.revcomp(np.asarray(q))
                              if pl.strand[i] else np.asarray(q))
        s, qe, te = sw_xla.sw_batch(
            jnp.asarray(qb), jnp.asarray(ql[idx_hit]),
            jnp.asarray(tw), jnp.asarray(np.maximum(tl, 1)),
            BWA_PARAMS, "local")
        for j, (i, si, ws) in enumerate(meta):
            q = qb[j, :int(ql[i])]
            t = tw[j, :int(tl[j])]
            qs, ts, _ = alignment_stats(q, t, BWA_PARAMS, "local",
                                        int(qe[j]), int(te[j]))
            out[i] = (si, int(pl.strand[i]), ws + ts, ws + int(te[j]),
                      qs, int(qe[j]), int(s[j]))

    # unseeded queries: exact fallback only when the genome is small
    if len(genome.seq) <= _FALLBACK_GENOME_LIMIT:
        for i in range(n):
            if out[i] is None:
                out[i] = _best_placement(np.asarray(queries[i]), genome)
    return out


def extract_true_gap_seqs(gaps, genome_finished: fasta.Genome,
                          flank_left, flank_right, flank_lens,
                          index=None):
    """True gap sequences from a finished genome.

    For each gap, place both flanks; when they land on the same
    finished scaffold, same strand, in order, the truth is the
    sequence between them (gnrt_gap_seqs semantics, with the
    clipped-placement filter). Returns {gap_idx: codes}.
    """
    ll, rl = flank_lens
    G = len(gaps["start"])
    live, queries = [], []
    for g in range(G):
        lseq = np.asarray(flank_left[g][:int(ll[g])])
        rseq = np.asarray(flank_right[g][:int(rl[g])])
        if len(lseq) < 20 or len(rseq) < 20:
            continue
        live.append(g)
        queries.append(lseq)
        queries.append(rseq)
    places = seeded_placements(queries, genome_finished, index=index)
    out = {}
    for j, g in enumerate(live):
        lseq, rseq = queries[2 * j], queries[2 * j + 1]
        pl_, pr_ = places[2 * j], places[2 * j + 1]
        if pl_ is None or pr_ is None:
            continue
        (si1, st1, ts1, te1, qs1, qe1, sc1) = pl_
        (si2, st2, ts2, te2, qs2, qe2, sc2) = pr_
        # qualified placements: mostly unclipped
        if (qs1 > FLANK_CLIP_CUTOFF or len(lseq) - qe1 > FLANK_CLIP_CUTOFF or
                qs2 > FLANK_CLIP_CUTOFF or len(rseq) - qe2 > FLANK_CLIP_CUTOFF):
            continue
        if si1 != si2 or st1 != st2:
            continue
        t = genome_finished.scaffold(si1)
        if st1 == 0:
            start, end = te1, ts2
            if start < end:
                out[g] = t[start:end].copy()
        else:
            start, end = te2, ts1
            if start < end:
                out[g] = dna.revcomp(t[start:end].copy())
    return out


def closure_stats(picked: dict[int, np.ndarray],
                  truths: dict[int, np.ndarray]):
    """statistic_rslt equivalent: which fills align to truth unclipped?

    Returns dict with hit_list (closed gap indices), closed_lengths,
    and per-gap identity fraction."""
    hits, lengths, ident = [], [], {}
    for g, fill in sorted(picked.items()):
        truth = truths.get(g)
        if truth is None or len(truth) == 0 or len(fill) == 0:
            continue
        L = max(len(fill), 8)
        qa = np.full((1, L), dna.N, np.int8)
        qa[0, :len(fill)] = np.asarray(fill)
        ta = np.full((1, max(len(truth), 8)), dna.N, np.int8)
        ta[0, :len(truth)] = truth
        s, qe, te = sw_xla.sw_batch(
            jnp.asarray(qa), jnp.asarray([len(fill)], jnp.int32),
            jnp.asarray(ta), jnp.asarray([len(truth)], jnp.int32),
            BWA_PARAMS, "local")
        # try reverse strand too
        qa2 = np.full((1, L), dna.N, np.int8)
        qa2[0, :len(fill)] = dna.revcomp(np.asarray(fill))
        s2, qe2, te2 = sw_xla.sw_batch(
            jnp.asarray(qa2), jnp.asarray([len(fill)], jnp.int32),
            jnp.asarray(ta), jnp.asarray([len(truth)], jnp.int32),
            BWA_PARAMS, "local")
        if int(s2[0]) > int(s[0]):
            q = dna.revcomp(np.asarray(fill))
            qe, te, s = qe2, te2, s2
        else:
            q = np.asarray(fill)
        qs, ts, m = alignment_stats(q, truth, BWA_PARAMS, "local",
                                    int(qe[0]), int(te[0]))
        lclip = qs
        rclip = len(fill) - int(qe[0])
        if lclip < CLIP_CUTOFF and rclip < CLIP_CUTOFF:
            hits.append(g)
            lengths.append(len(truth))
            ident[g] = m / max(len(fill), 1)
    return {"hit_list": hits, "closed_lengths": lengths,
            "identity": ident,
            "n_closed": len(hits)}


def extract_filled_regions(filled_genome: fasta.Genome, gaps,
                           fills: dict[int, np.ndarray], margin: int = 5):
    """get_filled_seq_from_out_scf equivalent: pull each filled gap's
    sequence back out of a patched scaffold FASTA.

    Accounts for the length change each upstream fill introduces on the
    same scaffold. Returns {gap_idx: codes}."""
    out = {}
    shift: dict[int, int] = {}
    for g in sorted(fills):
        si = int(gaps["scaffold"][g])
        s = int(gaps["local_start"][g]) - margin
        e = int(gaps["local_end"][g]) + margin
        off = shift.get(si, 0)
        seq = filled_genome.scaffold(si)
        fill_len = len(fills[g])
        out[g] = seq[s + off: s + off + fill_len].copy()
        shift[si] = off + fill_len - (e - s)
    return out


def discordant_alignment_stats(rec, readsets, truths, gaps):
    """discordant_alignment_statistic.py equivalent: what fraction of
    each gap's recruited reads align to its truth sequence?"""
    from ..ops.sw_host import SWParams
    out = {}
    for g, truth in truths.items():
        sel = rec["gap"] == g
        n = int(sel.sum())
        if n == 0 or len(truth) < 8:
            continue
        rows = list(zip(rec["lib"][sel], rec["side"][sel],
                        rec["row"][sel]))[:256]
        L = max(max(int(readsets[li][s].length[r]) for li, s, r in rows), 8)
        qa = np.full((len(rows), L), dna.N, np.int8)
        ql = np.zeros(len(rows), np.int32)
        for i, (li, s, r) in enumerate(rows):
            rs = readsets[li][s]
            ln = int(rs.length[r])
            qa[i, :ln] = rs.get_seq(r)[:ln]
            ql[i] = ln
        ta = np.tile(np.asarray(truth, np.int8), (len(rows), 1))
        tl = np.full(len(rows), len(truth), np.int32)
        s1, _, _ = sw_xla.sw_batch(jnp.asarray(qa), jnp.asarray(ql),
                                   jnp.asarray(ta), jnp.asarray(tl),
                                   SWParams(1, -4, 7, 1), "local")
        qrc = np.stack([np.asarray(dna.revcomp_jnp(
            jnp.asarray(qa[i]), int(ql[i]))) for i in range(len(rows))])
        s2, _, _ = sw_xla.sw_batch(jnp.asarray(qrc), jnp.asarray(ql),
                                   jnp.asarray(ta), jnp.asarray(tl),
                                   SWParams(1, -4, 7, 1), "local")
        score = np.maximum(np.asarray(s1), np.asarray(s2))
        aligned = score >= 0.5 * ql
        out[g] = float(aligned.mean())
    return out
