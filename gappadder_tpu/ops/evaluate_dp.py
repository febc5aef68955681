"""Device (XLA) kernel for the ContigsMerger Evaluate overlap DP.

The reference's #1 hot loop (SURVEY.md §3) is ``ContigsCompactor::
Evaluate`` (/root/reference/ContigsCompactor-v0.2.0/ContigsMerger/
ContigsCompactor.cpp:1572-1874): a full O(n*m) overlap DP per contig
pair, ends scanned over the last ``max_clip_len`` rows/columns, plus a
traceback whose ENDPOINT decides containment. merge_engine previously
ran this in host numpy (anti-diagonal Python loops); this module runs
the whole evaluation — matrix fill, end scan, winner selection AND the
traceback-endpoint flags — in one jit per shape bucket, so a batch of
pairs (across many gaps) costs one device dispatch + one small
readback instead of per-pair host sweeps.

Exactness notes (validated bit-for-bit vs merge_engine.evaluate_pair):
  * free start on both sequences (H row/col 0 = 0), linear indels,
    raw character equality (N matches N);
  * end scan: for c = 0..max_clip, column m-c is scanned BEFORE row
    n-c, candidates improve only on STRICT >, argmax within a column/
    row takes the FIRST maximum (lowest row/col) — all reproduced by
    interleaving candidates in scan order and taking the first argmax;
  * traceback pointer preference: left if left > max(diag, up), else
    up if up > diag, else diag (ContigsCompactor.cpp:1695-1711). The
    kernel propagates each cell's traceback ENDPOINT flags
    (i==0 / j==0 at the stop cell) through the same preference, so the
    host never needs the matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEGB = -(1 << 28)


@functools.partial(jax.jit,
                   static_argnames=("max_clip", "match", "mismatch", "ind"))
def eval_batch_kernel(q, qlen, t, tlen, *, max_clip: int,
                      match: int = 1, mismatch: int = -2, ind: int = -2):
    """Batched Evaluate: returns int32 [6, B] =
    (best, pos_row, pos_col, nclip, ends_i0, ends_j0).

    q [B, n_max] / t [B, m_max] int8/int32 codes with DISTINCT padding
    sentinels per side (caller pads q with -1, t with -2 so padded
    cells always mismatch, exactly like the host batch fill); qlen /
    tlen int32 valid lengths (>= 1).
    """
    B, n_max = q.shape
    m_max = t.shape[1]
    q = q.astype(jnp.int32)
    t = t.astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    jcol = jnp.arange(m_max + 1, dtype=jnp.int32)[None, :]     # [1, m+1]
    indj = jnp.int32(ind) * jcol

    # flags packed per cell: bit0 = endpoint row == 0, bit1 = col == 0
    row0_H = jnp.zeros((B, m_max + 1), jnp.int32)
    row0_e = jnp.where(jcol == 0, jnp.int8(3), jnp.int8(1))
    row0_e = jnp.broadcast_to(row0_e, (B, m_max + 1)).astype(jnp.int8)
    col0_e = jnp.full((B, 1), 2, jnp.int8)    # cells (i>0, 0): j==0 only

    def step(carry, qi):
        prevH, prev_e = carry
        s = jnp.where(t == qi[:, None], jnp.int32(match),
                      jnp.int32(mismatch))                     # j = 1..m
        d = prevH[:, :-1] + s
        u = prevH[:, 1:] + jnp.int32(ind)
        c = jnp.maximum(d, u)
        c_full = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), c], axis=1)         # j = 0..m
        # H[i, j] = max(c_j, H[i, j-1] + ind)  ==  running max form
        H = indj + jax.lax.cummax(c_full - indj, axis=1)
        # pointer preference at j >= 1 (left wins only on STRICT >)
        left = (H[:, :-1] + jnp.int32(ind)) > c
        up = (~left) & (u > d)
        base = jnp.where(up, prev_e[:, 1:], prev_e[:, :-1])
        base_full = jnp.concatenate([col0_e, base], axis=1)
        notleft = jnp.concatenate(
            [jnp.ones((B, 1), bool), ~left], axis=1)
        src = jax.lax.cummax(
            jnp.where(notleft, jcol, jnp.int32(-1)), axis=1)
        e = jnp.take_along_axis(base_full, src, axis=1)
        return (H, e), (H, e)

    (_, _), (Hrows, Erows) = jax.lax.scan(step, (row0_H, row0_e), q.T)
    H = jnp.concatenate([row0_H[:, None], Hrows.transpose(1, 0, 2)],
                        axis=1)                        # [B, n+1, m+1]
    E = jnp.concatenate([row0_e[:, None], Erows.transpose(1, 0, 2)],
                        axis=1)

    C1 = max_clip + 1
    cvec = jnp.arange(C1, dtype=jnp.int32)[None, :]            # [1, C1]
    # column candidates: icol = m - c, best over rows 0..n (first max)
    icol = tlen[:, None] - cvec                                # [B, C1]
    icol_ok = icol >= 0
    icol_c = jnp.clip(icol, 0, m_max)
    colsH = jnp.take_along_axis(
        H, jnp.broadcast_to(icol_c[:, None, :], (B, n_max + 1, C1)),
        axis=2)                                                # [B, n+1, C1]
    rows_ok = jnp.arange(n_max + 1)[None, :] <= qlen[:, None]  # [B, n+1]
    colsH = jnp.where(rows_ok[:, :, None] & icol_ok[:, None, :],
                      colsH, NEGB)
    col_val = colsH.max(axis=1)
    col_pr = colsH.argmax(axis=1).astype(jnp.int32)            # [B, C1]
    # row candidates: irow = n - c, best over cols 0..m (first max)
    irow = qlen[:, None] - cvec
    irow_ok = irow >= 0
    irow_c = jnp.clip(irow, 0, n_max)
    rowsH = jnp.take_along_axis(
        H, jnp.broadcast_to(irow_c[:, :, None], (B, C1, m_max + 1)),
        axis=1)                                                # [B, C1, m+1]
    cols_ok = jnp.arange(m_max + 1)[None, None, :] <= tlen[:, None, None]
    rowsH = jnp.where(cols_ok & irow_ok[:, :, None], rowsH, NEGB)
    row_val = rowsH.max(axis=2)
    row_pc = rowsH.argmax(axis=2).astype(jnp.int32)

    # interleave in the reference scan order: col(c) before row(c),
    # c ascending; strict improvement == first argmax over this order
    vals = jnp.stack([col_val, row_val], axis=2).reshape(B, 2 * C1)
    w = jnp.argmax(vals, axis=1).astype(jnp.int32)
    bi = jnp.arange(B)
    best = vals[bi, w]
    is_row = (w % 2) == 1
    cwin = w // 2
    pr = jnp.where(is_row, irow[bi, cwin], col_pr[bi, cwin])
    pc = jnp.where(is_row, row_pc[bi, cwin], icol[bi, cwin])
    eflag = E[bi, pr, pc].astype(jnp.int32)
    return jnp.stack([best, pr, pc, cwin,
                      eflag & 1, (eflag >> 1) & 1]).astype(jnp.int32)


def _bucket(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


# cells-per-dispatch budget: B * (n+1) * (m+1) * ~5 bytes live
_CELL_BUDGET = 128 << 20


def eval_pairs_device(pairs_seqs, max_clip: int, match: int = 1,
                      mismatch: int = -2, ind: int = -2):
    """Run a ragged list of (s1, s2) pairs through eval_batch_kernel.

    Returns numpy int32 [len(pairs), 6] rows of
    (best, pos_row, pos_col, nclip, ends_i0, ends_j0).
    Pairs are grouped into (n, m) shape buckets, each bucket split to a
    device cell budget; one dispatch + one readback per sub-batch.
    """
    P = len(pairs_seqs)
    out = np.zeros((P, 6), np.int32)
    if P == 0:
        return out
    groups: dict[tuple[int, int], list[int]] = {}
    for i, (a, b) in enumerate(pairs_seqs):
        key = (_bucket(max(len(a), 1), 64), _bucket(max(len(b), 1), 64))
        groups.setdefault(key, []).append(i)
    for (nb, mb), idxs in sorted(groups.items()):
        cap = max(_CELL_BUDGET // ((nb + 1) * (mb + 1)), 1)
        for lo in range(0, len(idxs), cap):
            sub = idxs[lo:lo + cap]
            Bb = _bucket(len(sub), 8)
            qa = np.full((Bb, nb), -1, np.int32)
            ta = np.full((Bb, mb), -2, np.int32)
            ql = np.ones(Bb, np.int32)
            tl = np.ones(Bb, np.int32)
            for r, i in enumerate(sub):
                a, b = pairs_seqs[i]
                qa[r, :len(a)] = a
                ta[r, :len(b)] = b
                ql[r] = max(len(a), 1)
                tl[r] = max(len(b), 1)
            res = np.asarray(eval_batch_kernel(
                jnp.asarray(qa), jnp.asarray(ql), jnp.asarray(ta),
                jnp.asarray(tl), max_clip=max_clip, match=match,
                mismatch=mismatch, ind=ind))
            for r, i in enumerate(sub):
                out[i] = res[:, r]
    return out
