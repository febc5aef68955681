"""Pallas TPU kernel: batched anti-diagonal wavefront affine-gap DP.

Same semantics as sw_xla.sw_batch / sw_host.sw_np (tested for
equality); built for throughput:

Layout (v2, "transposed"): DP lane axis (query position i = 0..Lq) on
SUBLANES (S = round_up(Lq+1, 8) rows), independent pairs on LANES
(TB = 128 per grid tile). One diagonal step therefore touches
S*TB/1024 ≈ 16 vector registers instead of the max(Lq,Lt)-wide state
of a lane-major layout — per-step work scales with the QUERY length
only, which is what makes short-query/long-target shapes (flank->
contig, read->contig) fast.

Target streaming: the kernel runs chunks of CS = S diagonals. For
chunk c the wrapper precomputes a reversed 2S-row window
  rbuf0[u, b] = t_b[(c+1)*CS + 1 - u]
so that after s in-kernel sublane rolls, rows [CS, CS+S) hold exactly
t_b[d-1-i] for diagonal d — no dynamic slicing (Mosaic forbids it),
just one static roll per step. DP state (H at d-1 and d-2, E, F, best)
lives in VMEM scratch that persists across the sequential chunk grid
dimension.

All boundary/initial values are derived from qlen/tlen data (never
splat constants): Mosaic's layout inference otherwise assigns
replicated layouts to loop carries and fails with "Invalid relayout".
('extend' mode still trips that bug in the final select; it is not on
a hot path and is routed to the XLA implementation on TPU.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw_host import SWParams

def _round_up(x, m):
    return (x + m - 1) // m * m


NEG16 = -(1 << 28)   # python int (weak-typed); name kept from the
                     # abandoned int16 variant (v5e Mosaic lacks int16
                     # rotate/iota/compare lowerings)


def _kernel(qlen_ref, tlen_ref, qreg_ref, rbuf_ref,
            score_ref, qend_ref, tend_ref,
            hm1_s, hm2_s, e_s, f_s, bs_s, bd_s,
            *, params: SWParams, mode: str, S: int, n_chunks: int,
            end_slack: int):
    TB = qlen_ref.shape[1]
    c = pl.program_id(1)
    go, ge = jnp.int32(params.gap_open), jnp.int32(params.gap_extend)

    qlen = qlen_ref[0:1, :]                       # [1, TB]
    tlen = tlen_ref[0:1, :]
    rows32 = jax.lax.broadcasted_iota(jnp.int32, (S, TB), 0)
    row = rows32                                  # i index
    qreg = qreg_ref[:]                            # [S, TB] int32 codes

    free_ends = mode in ("local", "overlap")
    clamp = mode == "local"
    zrow = qlen * 0                               # [1, TB] varying zero
    col0 = zrow if free_ends else zrow + NEG16

    def row0(d32):
        if free_ends:
            return jnp.where(d32 <= tlen, 0, NEG16) + zrow
        return zrow + NEG16

    def roll1(x):
        # circular sublane shift by 1 via static slices
        return jnp.concatenate(
            [jax.lax.slice_in_dim(x, x.shape[0] - 1, x.shape[0], axis=0),
             jax.lax.slice_in_dim(x, 0, x.shape[0] - 1, axis=0)], axis=0)

    def shift(x, fill):
        r = roll1(x)
        return jnp.where(row == 0, fill, r)

    # ---- chunk start: init or reload carried state ----------------------
    @pl.when(c == 0)
    def _():
        hm2 = jnp.where(row == 0, 0, NEG16) + zrow    # diag d=0
        hm1 = jnp.where(row == 0, row0(jnp.ones_like(tlen)), NEG16 + zrow)
        # (qlen + row*0) materializes a fully-varying operand: Mosaic
        # cannot AND a lane-replicated i1 with a sublane-replicated i1
        qmask = (qlen + row * 0) >= 1
        hm1 = jnp.where((row == 1) & qmask, col0, hm1)
        hm2_s[:] = hm2
        hm1_s[:] = hm1
        e_s[:] = (row * 0 + zrow) + NEG16
        f_s[:] = (row * 0 + zrow) + NEG16
        bs_s[:] = (row * 0 + zrow) + NEG16
        bd_s[:] = row * 0 + zrow

    Hm2 = hm2_s[:]
    Hm1 = hm1_s[:]
    Em1 = e_s[:]
    Fm1 = f_s[:]
    bs = bs_s[:]                                  # [S, TB] per-row best
    bd = bd_s[:]                                  # [S, TB] its diagonal
    rbuf = rbuf_ref[0]                            # [2S, TB] int32

    match16 = jnp.int32(params.match)
    mism16 = jnp.int32(params.mismatch)

    def body(s, carry):
        Hm2, Hm1, Em1, Fm1, rbuf, bs, bd = carry
        d16 = c * S + s + 2
        rbuf = roll1(rbuf)
        tr = jax.lax.slice_in_dim(rbuf, S, 2 * S, axis=0)  # [S, TB]

        E = jnp.maximum(jnp.maximum(Hm1 - go, Em1 - ge), NEG16)
        F = jnp.maximum(jnp.maximum(shift(Hm1, NEG16 + zrow) - go,
                                    shift(Fm1, NEG16 + zrow) - ge), NEG16)
        sc = jnp.where((qreg == tr) & (qreg < 4), match16, mism16)
        H = jnp.maximum(shift(Hm2, NEG16 + zrow) + sc, jnp.maximum(E, F))
        if clamp:
            H = jnp.maximum(H, 0)

        j = d16 - row
        valid = (row >= 1) & (row <= qlen) & (j >= 1) & (j <= tlen)
        H = jnp.where(valid, H, NEG16)
        E = jnp.where(valid, E, NEG16)
        F = jnp.where(valid, F, NEG16)
        H = jnp.where(row == 0, row0(d16 * jnp.ones_like(tlen)), H)
        H = jnp.where((row == d16) & (row <= qlen), col0, H)

        if mode == "overlap":
            endcell = valid & ((row >= qlen - end_slack) |
                               (j >= tlen - end_slack))
            cand = jnp.where(endcell, H, NEG16)
        else:
            cand = jnp.where(valid, H, NEG16)
        upd = cand > bs
        bs = jnp.where(upd, cand, bs)
        bd = jnp.where(upd, d16 + zrow, bd)
        return (Hm1, H, E, F, rbuf, bs, bd)

    carry = (Hm2, Hm1, Em1, Fm1, rbuf, bs, bd)
    Hm2, Hm1, Em1, Fm1, rbuf, bs, bd = jax.lax.fori_loop(
        0, S, body, carry)

    hm2_s[:] = Hm2
    hm1_s[:] = Hm1
    e_s[:] = Em1
    f_s[:] = Fm1
    bs_s[:] = bs
    bd_s[:] = bd

    @pl.when(c == n_chunks - 1)
    def _():
        # final reduction: lowest row among maxima, then its diagonal
        score = jnp.max(bs, axis=0, keepdims=True)          # [1, TB]
        bi = jnp.argmax(bs.astype(jnp.float32), axis=0)
        bi = bi.astype(jnp.int32)[None, :]
        bdw = jnp.max(jnp.where(rows32 == bi, bd, -1),
                      axis=0, keepdims=True)
        empty = score < 0
        # negative best: oracle falls back to H[qlen, 0] = 0 for
        # overlap (free leading gap) and the (0, 0) origin otherwise
        fb_q = qlen.astype(jnp.int32) if mode == "overlap" else score * 0
        score_ref[:] = jnp.where(empty, 0, score)
        qend_ref[:] = jnp.where(empty, fb_q, bi)
        tend_ref[:] = jnp.where(empty, 0, bdw - bi)


@functools.partial(jax.jit, static_argnames=("params", "mode", "batch_tile",
                                             "interpret", "end_slack"))
def sw_batch_pallas(q, qlen, t, tlen, params: SWParams = SWParams(),
                    mode: str = "local", batch_tile: int = 128,
                    interpret: bool | None = None, end_slack: int = 0):
    """Drop-in replacement for sw_xla.sw_batch (TPU kernel).

    q: [B, Lq] int8/int32 codes, t: [B, Lt]; per-pair lengths qlen/tlen.
    Returns (score, qend, tend) int32 [B].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mode == "extend" and not interpret:
        from . import sw_xla
        return sw_xla.sw_batch(q, qlen, t, tlen, params, mode,
                               end_slack=end_slack)

    B, Lq = q.shape
    Lt = t.shape[1]
    S = _round_up(Lq + 1, 8)               # int32 sublane tile is 8
    steps = Lq + Lt - 1                    # d = 2 .. Lq+Lt
    n_chunks = -(-steps // S)
    TB = 128
    Bp = _round_up(max(B, 1), TB)
    nbt = Bp // TB

    q16 = q.astype(jnp.int32)
    t16 = t.astype(jnp.int32)
    # qreg [S, Bp]: row i holds q[b, i-1], row 0 sentinel
    qreg = jnp.full((S, Bp), 127, jnp.int32)
    qreg = qreg.at[1:Lq + 1, :B].set(q16.T)
    # rbuf windows [n_chunks, 2S, Bp]: rbuf[c, u, b] = t_b[(c+1)S - u]
    # (the kernel rolls BEFORE reading, so after s+1 rolls row S+i holds
    # rbuf0[S+i-s-1] = t[(c+1)S - (S+i-s-1)] = t[cS+s+1-i] = t[d-1-i])
    cidx = jnp.arange(n_chunks, dtype=jnp.int32)[:, None]
    uidx = jnp.arange(2 * S, dtype=jnp.int32)[None, :]
    tpos = (cidx + 1) * S - uidx                           # [C, 2S]
    okpos = (tpos >= 0) & (tpos < Lt)
    tp = jnp.where(okpos, tpos, 0)
    rbuf = jnp.where(okpos[..., None],
                     jnp.take(t16, tp, axis=1).transpose(1, 2, 0),
                     jnp.int32(127))
    rbuf = jnp.concatenate(
        [rbuf, jnp.full((n_chunks, 2 * S, Bp - B), 127, jnp.int32)], axis=2)

    qlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(qlen.astype(jnp.int32))
    tlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(tlen.astype(jnp.int32))

    grid = (nbt, n_chunks)
    kernel = functools.partial(_kernel, params=params, mode=mode, S=S,
                               n_chunks=n_chunks, end_slack=end_slack)
    out_shape = [jax.ShapeDtypeStruct((1, Bp), jnp.int32)] * 3
    lane_spec16 = pl.BlockSpec((1, TB), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM)
    lane_spec32 = pl.BlockSpec((1, TB), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM)
    score, qend, tend = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            lane_spec16,                                  # qlen
            lane_spec16,                                  # tlen
            pl.BlockSpec((S, TB), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),        # qreg
            pl.BlockSpec((1, 2 * S, TB), lambda i, c: (c, 0, i),
                         memory_space=pltpu.VMEM),        # rbuf chunk
        ],
        out_specs=[lane_spec32] * 3,
        scratch_shapes=[
            pltpu.VMEM((S, TB), jnp.int32),   # Hm1
            pltpu.VMEM((S, TB), jnp.int32),   # Hm2
            pltpu.VMEM((S, TB), jnp.int32),   # E
            pltpu.VMEM((S, TB), jnp.int32),   # F
            pltpu.VMEM((S, TB), jnp.int32),   # best score per row
            pltpu.VMEM((S, TB), jnp.int32),   # best diag per row
        ],
        interpret=interpret,
    )(qlp, tlp, qreg, rbuf)
    return score[0, :B], qend[0, :B], tend[0, :B]
