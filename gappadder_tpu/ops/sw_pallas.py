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

NEG = -(1 << 28)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(qlen_ref, tlen_ref, qreg_ref, rbuf_ref,
            score_ref, qend_ref, tend_ref,
            hm1_s, hm2_s, e_s, f_s, best_s,
            *, params: SWParams, mode: str, S: int, n_chunks: int,
            end_slack: int):
    TB = qlen_ref.shape[1]
    c = pl.program_id(1)
    go, ge = params.gap_open, params.gap_extend

    qlen = qlen_ref[0:1, :]                       # [1, TB]
    tlen = tlen_ref[0:1, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (S, TB), 0)  # i index
    qreg = qreg_ref[:]                            # [S, TB] codes

    free_ends = mode in ("local", "overlap")
    clamp = mode == "local"
    zrow = qlen * 0                               # [1, TB] varying zero
    col0 = zrow if free_ends else zrow + NEG

    def row0(d):
        if free_ends:
            return jnp.where(d <= tlen, 0, NEG)
        return zrow + NEG

    def shift(x, fill):
        r = pltpu.roll(x, 1, 0)
        return jnp.where(row == 0, fill, r)

    # ---- chunk start: init or reload carried state ----------------------
    @pl.when(c == 0)
    def _():
        hm2 = jnp.where(row == 0, 0, NEG) + zrow          # diag d=0
        hm1 = jnp.where(row == 0, row0(jnp.ones_like(tlen)), NEG + zrow)
        hm1 = jnp.where((row == 1) & (qlen >= 1), col0, hm1)
        hm2_s[:] = hm2
        hm1_s[:] = hm1
        e_s[:] = zrow + jnp.full((S, TB), NEG, jnp.int32)
        f_s[:] = zrow + jnp.full((S, TB), NEG, jnp.int32)
        best_s[:] = jnp.concatenate(
            [zrow + NEG, zrow, zrow,
             jnp.broadcast_to(zrow, (5, TB))], axis=0)

    Hm2 = hm2_s[:]
    Hm1 = hm1_s[:]
    Em1 = e_s[:]
    Fm1 = f_s[:]
    bs = best_s[0:1, :]
    bi = best_s[1:2, :]
    bd = best_s[2:3, :]
    rbuf = rbuf_ref[0]                            # [2S, TB]

    def body(s, carry):
        Hm2, Hm1, Em1, Fm1, rbuf, bs, bi, bd = carry
        d = c * S + s + 2
        rbuf = pltpu.roll(rbuf, 1, 0)
        tr = jax.lax.slice_in_dim(rbuf, S, 2 * S, axis=0)  # [S, TB]

        E = jnp.maximum(Hm1 - go, Em1 - ge)
        F = jnp.maximum(shift(Hm1, NEG + zrow) - go,
                        shift(Fm1, NEG + zrow) - ge)
        sc = jnp.where((qreg == tr) & (qreg < 4),
                       jnp.int32(params.match), jnp.int32(params.mismatch))
        H = jnp.maximum(shift(Hm2, NEG + zrow) + sc, jnp.maximum(E, F))
        if clamp:
            H = jnp.maximum(H, 0)

        j = d - row
        valid = (row >= 1) & (row <= qlen) & (j >= 1) & (j <= tlen)
        H = jnp.where(valid, H, NEG)
        E = jnp.where(valid, E, NEG)
        F = jnp.where(valid, F, NEG)
        H = jnp.where(row == 0, row0(d * jnp.ones_like(tlen)), H)
        H = jnp.where((row == d) & (row <= qlen), col0, H)

        if mode == "overlap":
            endcell = valid & ((row >= qlen - end_slack) |
                               (j >= tlen - end_slack))
            cand = jnp.where(endcell, H, NEG)
        else:
            cand = jnp.where(valid, H, NEG)
        m = jnp.max(cand, axis=0, keepdims=True)            # [1, TB]
        am = jnp.argmax(cand.astype(jnp.float32), axis=0)
        am = am.astype(jnp.int32)[None, :]
        upd = m > bs
        bs = jnp.where(upd, m, bs)
        bi = jnp.where(upd, am, bi)
        bd = jnp.where(upd, d, bd)
        return (Hm1, H, E, F, rbuf, bs, bi, bd)

    carry = (Hm2, Hm1, Em1, Fm1, rbuf, bs, bi, bd)
    Hm2, Hm1, Em1, Fm1, rbuf, bs, bi, bd = jax.lax.fori_loop(
        0, S, body, carry)

    hm2_s[:] = Hm2
    hm1_s[:] = Hm1
    e_s[:] = Em1
    f_s[:] = Fm1
    best_s[0:1, :] = bs
    best_s[1:2, :] = bi
    best_s[2:3, :] = bd

    @pl.when(c == n_chunks - 1)
    def _():
        empty = bs < 0
        # negative best: oracle falls back to H[qlen, 0] = 0 for
        # overlap (free leading gap) and the (0, 0) origin otherwise
        fb_q = qlen if mode == "overlap" else zrow
        score_ref[:] = jnp.where(empty, 0, bs)
        qend_ref[:] = jnp.where(empty, fb_q, bi)
        tend_ref[:] = jnp.where(empty, 0, bd - bi)


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
    if (mode == "extend" and not interpret) or mode == "fit":
        # extend: Mosaic relayout bug (see module docstring);
        # fit: implemented in the XLA path only (pick-stage volume is
        # small — one pair per flank x contig x strand)
        from . import sw_xla
        return sw_xla.sw_batch(q, qlen, t, tlen, params, mode,
                               end_slack=end_slack)

    B, Lq = q.shape
    Lt = t.shape[1]
    S = _round_up(Lq + 1, 8)
    steps = Lq + Lt - 1                    # d = 2 .. Lq+Lt
    n_chunks = -(-steps // S)
    TB = 128
    Bp = _round_up(max(B, 1), TB)
    nbt = Bp // TB

    q32 = q.astype(jnp.int32)
    t32 = t.astype(jnp.int32)
    # qreg [S, Bp]: row i holds q[b, i-1], row 0 sentinel
    qreg = jnp.full((S, Bp), 127, jnp.int32)
    qreg = qreg.at[1:Lq + 1, :B].set(q32.T)
    # rbuf windows [n_chunks, 2S, Bp]: rbuf[c, u, b] = t_b[(c+1)S - u]
    # (the kernel rolls BEFORE reading, so after s+1 rolls row S+i holds
    # rbuf0[S+i-s-1] = t[(c+1)S - (S+i-s-1)] = t[cS+s+1-i] = t[d-1-i])
    cidx = jnp.arange(n_chunks, dtype=jnp.int32)[:, None]
    uidx = jnp.arange(2 * S, dtype=jnp.int32)[None, :]
    tpos = (cidx + 1) * S - uidx                           # [C, 2S]
    okpos = (tpos >= 0) & (tpos < Lt)
    tp = jnp.where(okpos, tpos, 0)
    rbuf = jnp.where(okpos[..., None],
                     jnp.take(t32, tp, axis=1).transpose(1, 2, 0), 127)
    rbuf = jnp.concatenate(
        [rbuf, jnp.full((n_chunks, 2 * S, Bp - B), 127, jnp.int32)], axis=2)

    qlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(qlen.astype(jnp.int32))
    tlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(tlen.astype(jnp.int32))

    grid = (nbt, n_chunks)
    kernel = functools.partial(_kernel, params=params, mode=mode, S=S,
                               n_chunks=n_chunks, end_slack=end_slack)
    out_shape = [jax.ShapeDtypeStruct((1, Bp), jnp.int32)] * 3
    lane_spec = pl.BlockSpec((1, TB), lambda i, c: (0, i),
                             memory_space=pltpu.VMEM)
    score, qend, tend = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            lane_spec,                                    # qlen
            lane_spec,                                    # tlen
            pl.BlockSpec((S, TB), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),        # qreg
            pl.BlockSpec((1, 2 * S, TB), lambda i, c: (c, 0, i),
                         memory_space=pltpu.VMEM),        # rbuf chunk
        ],
        out_specs=[lane_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((S, TB), jnp.int32),   # Hm1
            pltpu.VMEM((S, TB), jnp.int32),   # Hm2
            pltpu.VMEM((S, TB), jnp.int32),   # E
            pltpu.VMEM((S, TB), jnp.int32),   # F
            pltpu.VMEM((8, TB), jnp.int32),   # best (rows 0..2)
        ],
        interpret=interpret,
    )(qlp, tlp, qreg, rbuf)
    return score[0, :B], qend[0, :B], tend[0, :B]
