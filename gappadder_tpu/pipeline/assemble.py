"""Assembly stage: per-gap multi-k de-Bruijn assembly (round 1 core).

Replaces the reference's per-gap KMC -> kmc_dump -> cvtFaToFq ->
velveth/velvetg subprocess chain (assemble_gaps.py:82-135): for each
(k, sub_k) setting, count each gap's distinct canonical k-mers on
device and assemble THE K-MERS THEMSELVES (the reference's trick that
bounds assembly input size) with the batched DBG unitig assembler.

Contigs from all settings are concatenated per gap with the
reference's "<k>_<sub_k>_" name prefixes (assemble_gaps.py:124-135).
Gap batches are padded/bucketed so shapes stay static across jit
calls.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import dna
from ..config import Config
from ..ops import dbg, kmers

FULL = 0xFFFFFFFF


@dataclasses.dataclass
class GapContigs:
    """Per-gap contig sets (padded arrays + names)."""
    seq: np.ndarray      # int8 [G, C, Lmax]
    length: np.ndarray   # int32 [G, C]
    count: np.ndarray    # int32 [G]
    names: list[list[str]]  # [G][C] contig names ("<k>_<sub_k>_<i>")


def gap_distinct_kmers(reads, read_len, n_reads, k: int,
                       max_distinct: int, read_chunk: int = 512,
                       min_count: int = 0):
    """Distinct canonical k-mers of each gap's read set, with counts.

    Args:
      reads: int8 [G, R, L] padded read codes.
      read_len: int32 [G, R].
      n_reads: int32 [G] valid rows.
      max_distinct: static bound M on distinct k-mers per gap (overflow
        drops the lexicographically largest k-mers).
      min_count: 0 keeps everything (the reference's `kmc -ci0`,
        assemble_gaps.py:96-102); -1 = adaptive: when a gap's median
        k-mer multiplicity is >= 4, singleton k-mers (mostly sequencing
        errors) are dropped — a coverage-aware error filter standing in
        for Velvet's tour-bus.

    Returns:
      kstrings: int8 [G, M, k]; n_kstrings: int32 [G];
      kcounts: int32 [G, M] multiplicity of each k-string in the reads
        (bubble-pop coverage for the DBG).
    """
    G, R, L = reads.shape
    if L < k:
        pad = np.full((G, R, k - L), dna.N, np.int8)
        reads = np.concatenate([np.asarray(reads), pad], axis=2)
        L = k
    acc = jnp.full((G, max_distinct, kmers.num_limbs(k)), FULL, jnp.uint32)
    cnt = jnp.zeros((G, max_distinct), jnp.int32)
    row_idx = jnp.arange(R)
    reads_j = jnp.asarray(reads)
    rlen_j = jnp.asarray(read_len, jnp.int32)
    nr_j = jnp.asarray(n_reads, jnp.int32)
    for lo in range(0, R, read_chunk):
        hi = min(lo + read_chunk, R)
        chunk = reads_j[:, lo:hi]
        clen = jnp.where((row_idx[lo:hi][None, :] < nr_j[:, None]),
                         rlen_j[:, lo:hi], 0)
        acc, cnt = _merge_chunk(chunk, clen, acc, cnt, k)

    distinct = ~jnp.all(acc == jnp.uint32(FULL), axis=-1)
    if min_count == -1:
        counts = jnp.where(distinct, cnt, 0)
        # instance-weighted mean multiplicity (the average coverage of a
        # random k-mer OCCURRENCE): error singletons can dominate the
        # plain median, but contribute almost nothing here
        cf = counts.astype(jnp.float32)
        inst = jnp.sum(cf, axis=-1)
        inst2 = jnp.sum(cf * cf, axis=-1)
        mean_inst = inst2 / jnp.maximum(inst, 1.0)
        drop = (mean_inst >= 4)[:, None] & (cnt < 2)
        distinct = distinct & ~drop
        acc = jnp.where(distinct[..., None], acc, jnp.uint32(FULL))
        cnt = jnp.where(distinct, cnt, 0)
        acc, ex = kmers.sort_kmers(acc, [cnt])
        cnt = ex[0]
        distinct = ~jnp.all(acc == jnp.uint32(FULL), axis=-1)
    elif min_count > 1:
        keep = distinct & (cnt >= min_count)
        acc = jnp.where(keep[..., None], acc, jnp.uint32(FULL))
        cnt = jnp.where(keep, cnt, 0)
        acc, ex = kmers.sort_kmers(acc, [cnt])
        cnt = ex[0]
        distinct = ~jnp.all(acc == jnp.uint32(FULL), axis=-1)

    n = jnp.sum(distinct, axis=-1).astype(jnp.int32)
    kstr = dbg.unpack_kmers_to_strings(acc, k)
    return np.asarray(kstr), np.asarray(n), np.asarray(cnt)


@jax.jit
def _merge_chunk_impl(acc, acc_cnt, limbs_new, cnt_new):
    G, M, nl = acc.shape
    both = jnp.concatenate([acc, limbs_new], axis=1)
    cnts = jnp.concatenate([acc_cnt, cnt_new], axis=1)
    ops = [both[..., l] for l in range(nl)] + [cnts]
    res = jax.lax.sort(tuple(ops), dimension=1, num_keys=nl)
    s = jnp.stack(res[:nl], axis=-1)
    scnt = res[nl]
    first = kmers.unique_mask(s)
    keep = first & ~jnp.all(s == jnp.uint32(FULL), axis=-1)
    # segment-sum counts of equal keys: total prefix sums at run starts
    csum = jnp.cumsum(scnt, axis=-1)
    P = s.shape[1]
    idx = jnp.arange(P, dtype=jnp.int32)
    nxt = kmers._next_first(first)
    zero = jnp.zeros_like(csum[..., :1])
    c0 = jnp.concatenate([zero, csum], axis=-1)
    seg = jnp.take_along_axis(c0, nxt, axis=-1) - \
        jnp.take_along_axis(c0, jnp.where(first, idx[None, :], 0), axis=-1)
    seg = jnp.where(keep, seg, 0)
    order = jnp.argsort(~keep, axis=-1, stable=True)
    merged = jnp.take_along_axis(s, order[..., None], axis=-2)
    mcnt = jnp.take_along_axis(seg, order, axis=-1)
    n = jnp.sum(keep, axis=-1)
    inb = (jnp.arange(merged.shape[1]) < n[:, None])
    merged = jnp.where(inb[..., None], merged, jnp.uint32(FULL))
    mcnt = jnp.where(inb, mcnt, 0)
    return merged[:, :M], mcnt[:, :M]


def _merge_chunk(chunk, clen, acc, acc_cnt, k):
    limbs, valid = kmers.extract_kmers(chunk, clen, k)   # [G, Rc, P, nl]
    limbs = kmers.canonicalize(limbs, k)
    limbs = jnp.where(valid[..., None], limbs, jnp.uint32(FULL))
    G = limbs.shape[0]
    flat = limbs.reshape(G, -1, limbs.shape[-1])
    ones = jnp.where(valid.reshape(G, -1), 1, 0).astype(jnp.int32)
    return _merge_chunk_impl(acc, acc_cnt, flat, ones)


def assemble_gap_batch(cfg: Config, reads, read_len, n_reads,
                       max_distinct: int = 1 << 14,
                       max_unitigs_per_setting: int = 32,
                       max_contig_len: int = 2048) -> GapContigs:
    """Run all (k, sub_k) settings over one padded gap batch."""
    G = reads.shape[0]
    seqs, lens, counts, names = [], [], [], [[] for _ in range(G)]
    for (k, sub_k) in cfg.kmers:
        kstr, nk, kcnt = gap_distinct_kmers(reads, read_len, n_reads, k,
                                            max_distinct,
                                            min_count=cfg.min_kmer_count)
        useq, ulen, ucnt = dbg.assemble_unitigs(
            jnp.asarray(kstr), jnp.asarray(nk), jnp.asarray(kcnt),
            k=k, sub_k=sub_k,
            max_unitigs=max_unitigs_per_setting, max_len=max_contig_len,
            min_len=cfg.min_contig_len,
            pop_bubbles=cfg.bubble_pop_rounds)
        useq, ulen, ucnt = map(np.asarray, (useq, ulen, ucnt))
        seqs.append(useq)
        lens.append(ulen)
        counts.append(ucnt)
        for g in range(G):
            names[g] += [f"{k}_{sub_k}_{i}" for i in range(int(ucnt[g]))]

    # compact per gap: concatenate settings, packing valid contigs first
    C = sum(s.shape[1] for s in seqs)
    out_seq = np.full((G, C, max_contig_len), dna.N, np.int8)
    out_len = np.zeros((G, C), np.int32)
    out_cnt = np.zeros(G, np.int32)
    for g in range(G):
        c = 0
        for si in range(len(seqs)):
            n = int(counts[si][g])
            out_seq[g, c:c + n] = seqs[si][g, :n]
            out_len[g, c:c + n] = lens[si][g, :n]
            c += n
        out_cnt[g] = c
    return GapContigs(seq=out_seq, length=out_len, count=out_cnt,
                      names=names)
