"""Seed-and-extend read->contig matching (the bwa-mem replacement for
contig-target alignments, L2).

The reference shells out to `bwa mem -a` whenever reads must be placed
onto contigs (both-unmapped rescue, collect_both_unmapped_reads.py:158;
HQ clip-read augmentation, assemble_gaps.py:166-217). Here:

  1. an exact k-mer index of the contigs (packed limbs + contig id,
     lexicographically sorted);
  2. read k-mers (both strands) joined against the index by multi-key
     sort-merge with fixed fanout;
  3. (read, contig, strand) candidates deduped + vote-counted;
  4. survivors verified with the batched SW kernel (bwa scoring).

Everything through step 3 is device sorts/gathers; step 4 is the
existing alignment kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import dna
from . import kmers

FULL = jnp.uint32(0xFFFFFFFF)


def build_index(contig_seq, contig_len, k: int):
    """K-mer index of a contig set.

    Args:
      contig_seq: int8 [C, L]; contig_len: int32 [C].

    Returns dict with sorted arrays: limbs [M, nl] uint32, contig [M]
    int32 (padded entries have limbs FULL / contig -1).
    """
    C, L = contig_seq.shape
    limbs, valid = kmers.extract_kmers(jnp.asarray(contig_seq),
                                       jnp.asarray(contig_len, jnp.int32), k)
    P = limbs.shape[1]
    flat = limbs.reshape(C * P, -1)
    ids = jnp.repeat(jnp.arange(C, dtype=jnp.int32), P)
    ids = jnp.where(valid.reshape(-1), ids, -1)
    pos = jnp.tile(jnp.arange(P, dtype=jnp.int32), C)
    nl = flat.shape[-1]
    ops = [flat[:, l] for l in range(nl)] + [ids, pos]
    res = jax.lax.sort(tuple(ops), dimension=0, num_keys=nl)
    return {"limbs": jnp.stack(res[:nl], axis=-1), "contig": res[nl],
            "pos": res[nl + 1]}


@functools.partial(jax.jit, static_argnames=("k", "fanout"))
def match_candidates(read_seq, read_len, index_limbs, index_contig,
                     k: int, fanout: int = 4, index_pos=None):
    """Candidate (read, contig, strand) votes via k-mer join.

    Returns:
      contig: int32 [N, 2, P, fanout] matched contig ids (-1 none),
        axis 1 = strand (0 fwd, 1 revcomp of read);
      if index_pos is given, also diag: int32 [N, 2, P, fanout] —
        the seed diagonal (contig_pos - read_pos) of each hit.
    """
    N, L = read_seq.shape
    rc = dna.revcomp_jnp(read_seq, read_len)
    both = jnp.stack([read_seq, rc], axis=1)            # [N, 2, L]
    limbs, valid = kmers.extract_kmers(
        both, jnp.broadcast_to(read_len[:, None], (N, 2)), k)
    P = limbs.shape[-2]
    nl = limbs.shape[-1]
    q = limbs.reshape(N * 2 * P, nl)

    M = index_limbs.shape[0]
    Q = q.shape[0]
    # sort-merge lower-bound: position of each query kmer in the index
    tag = jnp.concatenate([jnp.zeros(M, jnp.int32), jnp.ones(Q, jnp.int32)])
    keys = jnp.concatenate([index_limbs, q], axis=0)
    payload = jnp.concatenate([jnp.arange(M, dtype=jnp.int32),
                               jnp.arange(Q, dtype=jnp.int32)])
    ops = [keys[:, l] for l in range(nl)] + [tag, payload]
    res = jax.lax.sort(tuple(ops), dimension=0, num_keys=nl + 1)
    stag, spay = res[nl], res[nl + 1]
    pos_in_index = jnp.cumsum((stag == 0).astype(jnp.int32))
    is_q = stag == 1
    tgt = jnp.where(is_q, spay, Q)
    hi = jnp.zeros(Q + 1, jnp.int32).at[tgt].set(pos_in_index,
                                                 mode="drop")[:Q]
    # candidates: index rows hi-1-f .. check key equality
    offs = jnp.arange(fanout, dtype=jnp.int32)
    cand = hi[:, None] - 1 - offs[None, :]
    cc = jnp.clip(cand, 0, M - 1)
    eq = jnp.ones(cand.shape, bool)
    for l in range(nl):
        eq &= index_limbs[cc, l] == q[:, l][:, None]
    eq &= cand >= 0
    eq &= ~jnp.all(q == FULL, axis=-1)[:, None]
    contig = jnp.where(eq, index_contig[cc], -1)
    if index_pos is None:
        return contig.reshape(N, 2, P, fanout)
    rpos = jnp.tile(jnp.arange(P, dtype=jnp.int32), N * 2)[:, None]
    diag = jnp.where(eq, index_pos[cc] - rpos, 0)
    return (contig.reshape(N, 2, P, fanout),
            diag.reshape(N, 2, P, fanout))


def vote_pairs(contig_votes, min_votes: int = 2, diag_votes=None):
    """Host: dedupe candidates into (read, strand, contig, votes)
    tuples; with diag_votes, (read, strand, contig, votes, diag) where
    diag is the median seed diagonal (contig_pos - read_pos)."""
    cv = np.asarray(contig_votes)
    dv = np.asarray(diag_votes) if diag_votes is not None else None
    N = cv.shape[0]
    out = []
    for r in range(N):
        for s in range(2):
            flat = cv[r, s].reshape(-1)
            ok = flat >= 0
            vals, cnts = np.unique(flat[ok], return_counts=True)
            for c, n in zip(vals, cnts):
                if n < min_votes:
                    continue
                if dv is None:
                    out.append((r, s, int(c), int(n)))
                else:
                    dsel = dv[r, s].reshape(-1)[ok & (flat == c)]
                    out.append((r, s, int(c), int(n),
                                int(np.median(dsel))))
    return out
