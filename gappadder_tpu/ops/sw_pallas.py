"""Pallas TPU kernel: batched anti-diagonal wavefront affine-gap DP.

Same semantics as sw_xla.sw_batch / sw_host.sw_np (tested for
equality); the difference is performance: the DP state vectors stay
resident in VMEM/vregs across all Lq+Lt diagonal steps instead of
streaming through HBM as lax.scan loop carries, so the kernel is
VPU-bound rather than HBM-bound.

Layout: batch tile TB on sublanes, DP lane axis (query position
i = 0..Lq) on lanes, all state arrays [TB, W] with one shared width
W = round_up(max(Lq+1, Lt), 128).

The target register trick: Mosaic cannot dynamically slice lanes, so
instead of inserting t[d-1] into lane 0 each diagonal, the wrapper
preloads the target REVERSED mod W (rw0[m] = t[(W-m) mod W]); one
static pltpu.roll(+1) per step then lands t[d-i-1] in lane i for every
diagonal d. Wraparound after W steps is harmless: a valid cell needs
t[j-1] with j-1 < Lt <= W, and (x mod W) = x for x < W.

Per step: three lane-rolls, ~10 VPU elementwise ops, two lane
reductions. Grid = batch tiles.
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


def _kernel(qreg_ref, qlen_ref, trev_ref, tlen_ref,
            score_ref, qend_ref, tend_ref,
            *, params: SWParams, mode: str, steps: int, end_slack: int = 0):
    TB, W = qreg_ref.shape
    go, ge = params.gap_open, params.gap_extend

    qlen = qlen_ref[:, 0:1]                      # [TB,1]
    tlen = tlen_ref[:, 0:1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
    qreg = qreg_ref[:].astype(jnp.int32)         # lane i -> q[i-1], lane0 127
    rw = trev_ref[:].astype(jnp.int32)           # rw[m] = t[(W-m) mod W]

    free_ends = mode in ("local", "overlap")
    clamp = mode == "local"
    col0 = jnp.int32(0) if free_ends else jnp.int32(NEG)

    def row0(d):
        if free_ends:
            return jnp.where(d <= tlen, 0, NEG)  # [TB,1]
        # extend: origin handled at d=0. Derive from tlen (not a splat
        # constant) to dodge a Mosaic replicated-layout relayout bug.
        return tlen * 0 + NEG

    def shift(x, fill):
        r = pltpu.roll(x, 1, 1)
        return jnp.where(lane == 0, fill, r)

    # init: Hm2 = diag d=0, Hm1 = diag d=1. Every carry is derived from
    # input data (+ qlen*0) so Mosaic never assigns a replicated layout
    # to a scan carry (replicated->varying relayout at the loop back
    # edge fails to compile).
    zrow = qlen * 0                                  # [TB,1] varying zero
    Hm2 = jnp.where(lane == 0, 0, NEG) + zrow
    Hm1 = jnp.where(lane == 0, row0(jnp.ones_like(tlen)), NEG + zrow)
    Hm1 = jnp.where((lane == 1) & (qlen >= 1), col0, Hm1)
    Em1 = zrow + jnp.full((TB, W), NEG, jnp.int32)
    Fm1 = zrow + jnp.full((TB, W), NEG, jnp.int32)

    best0 = (zrow + NEG, zrow, zrow)

    def body(step, carry):
        Hm2, Hm1, Em1, Fm1, rw, best = carry
        d = step + 2
        rw = pltpu.roll(rw, 1, 1)                # rw[i] = t[(d-i-1) mod W]

        E = jnp.maximum(Hm1 - go, Em1 - ge)
        F = jnp.maximum(shift(Hm1, NEG) - go, shift(Fm1, NEG) - ge)
        s = jnp.where((qreg == rw) & (qreg < 4),
                      jnp.int32(params.match), jnp.int32(params.mismatch))
        H = jnp.maximum(shift(Hm2, NEG) + s, jnp.maximum(E, F))
        if clamp:
            H = jnp.maximum(H, 0)

        j = d - lane
        valid = (lane >= 1) & (lane <= qlen) & (j >= 1) & (j <= tlen)
        H = jnp.where(valid, H, NEG)
        E = jnp.where(valid, E, NEG)
        F = jnp.where(valid, F, NEG)
        H = jnp.where(lane == 0, row0(d * jnp.ones_like(tlen)), H)
        H = jnp.where((lane == d) & (lane <= qlen), col0, H)

        if mode == "overlap":
            endcell = valid & ((lane >= qlen - end_slack) |
                               (j >= tlen - end_slack))
            cand = jnp.where(endcell, H, NEG)
        else:
            cand = jnp.where(valid, H, NEG)
        m = jnp.max(cand, axis=1, keepdims=True)
        # Mosaic argmax only lowers for f32; scores are far below 2^24
        # so the cast is exact (ties still resolve to the lowest lane).
        am = jnp.argmax(cand.astype(jnp.float32), axis=1)
        am = am.astype(jnp.int32)[:, None]
        bs, bi, bd = best
        upd = m > bs
        best = (jnp.where(upd, m, bs), jnp.where(upd, am, bi),
                jnp.where(upd, d, bd))
        return (Hm1, H, E, F, rw, best)

    carry = (Hm2, Hm1, Em1, Fm1, rw, best0)
    *_, best = jax.lax.fori_loop(0, steps, body, carry)
    score, bi, bd = best
    empty = score < 0
    score_ref[:] = jnp.where(empty, 0, score)
    qend_ref[:] = jnp.where(empty, 0, bi)
    tend_ref[:] = jnp.where(empty, 0, bd - bi)


@functools.partial(jax.jit, static_argnames=("params", "mode", "batch_tile",
                                             "interpret", "end_slack"))
def sw_batch_pallas(q, qlen, t, tlen, params: SWParams = SWParams(),
                    mode: str = "local", batch_tile: int = 256,
                    interpret: bool | None = None, end_slack: int = 0):
    """Drop-in replacement for sw_xla.sw_batch (TPU kernel).

    q: [B, Lq] int8/int32 codes, t: [B, Lt]; per-pair lengths qlen/tlen.
    Returns (score, qend, tend) int32 [B].
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    W = _round_up(max(Lq + 1, Lt, 128), 128)
    TB = min(batch_tile, _round_up(B, 8))
    Bp = _round_up(B, TB)

    # qreg layout: lane i holds q[i-1], lane 0 sentinel
    qp = jnp.full((Bp, W), 127, jnp.int32).at[:B, 1:Lq + 1].set(q.astype(jnp.int32))
    tp = jnp.full((Bp, W), 127, jnp.int32).at[:B, :Lt].set(t.astype(jnp.int32))
    # reversed-mod-W target: trev[:, m] = t[:, (W-m) mod W]
    trev = jnp.roll(tp[:, ::-1], 1, axis=1)
    qlp = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(qlen.astype(jnp.int32))
    tlp = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(tlen.astype(jnp.int32))

    steps = Lq + Lt - 1  # d = 2 .. Lq+Lt
    grid = (Bp // TB,)
    out_shape = [jax.ShapeDtypeStruct((Bp, 1), jnp.int32)] * 3
    bspec = lambda w: pl.BlockSpec((TB, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    score, qend, tend = pl.pallas_call(
        functools.partial(_kernel, params=params, mode=mode, steps=steps,
                          end_slack=end_slack),
        out_shape=out_shape,
        grid=grid,
        in_specs=[bspec(W), bspec(1), bspec(W), bspec(1)],
        out_specs=[bspec(1)] * 3,
        interpret=interpret,
    )(qp, qlp, trev, tlp)
    return score[:B, 0], qend[:B, 0], tend[:B, 0]
