"""Pallas bitonic sort for multi-limb integer keys (TPU).

The fused pipeline step is structurally bounded by XLA:TPU's sort
throughput (docs/kernel-notes.md round-4 anatomy): the k-mer count
merge and the DBG edge/endpoint joins are 60+ `lax.sort` dispatches
over [G, N] batches of 1-4-limb uint32 keys, each paying multiple HBM
round trips. This kernel runs the WHOLE bitonic network for a batch
slab inside one Pallas invocation with every pass VMEM-resident:

  layout   [n_ops, B*R, 128] — each batch row's N = R*128 elements
           laid row-major over (sublanes=R rows, lanes=128); all
           operands stacked on a leading axis so each butterfly pass
           is TWO rolls of one 3D array (not 2 per operand)
  partner  bitonic partner i^d: lane roll (d < 128) or sublane roll
           (d >= 128); the unselected roll direction is the only one
           that crosses a batch-row boundary, so batching many rows
           per slab is free (selection masks derive from the LOCAL
           index i = (row & (R-1))*128 + lane)
  compare  lexicographic uint32 ladder over the first num_keys
           operands; payload operands ride the same select
  network  standard bitonic: size 2,4..N ascending-block merge,
           log2(N)*(log2(N)+1)/2 fully unrolled passes

Sorting ascending; ties keep the element already at the position
(deterministic but NOT stable — pass stable=True to append an index
tie-break key, which is exactly what `lax.sort is_stable` costs).

Non-TPU backends, tiny N, and slabs that cannot fit VMEM fall back to
`jax.lax.sort` (bit-identical contract either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# max bytes of LIVE stacked planes per slab. Mosaic keeps ~8 copies
# alive across the fori carry + cond branches + roll temporaries
# (measured: 1.6 MB live compiles, 1.9 MB crashes the remote compile
# on 16 MB-VMEM v5e), so 1.25 MB live is the safe ceiling
_LIVE_MAX = 5 << 18
_MIN_PALLAS_N = 2048     # below this lax.sort's latency is fine


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def _pass_tables(n: int):
    """(sizes, ds) int32 arrays: the bitonic network's pass parameters
    for length n — size 2,4..n, d size/2..1 within each stage."""
    sizes, ds = [], []
    log2n = n.bit_length() - 1
    for k in range(1, log2n + 1):
        for j in range(k - 1, -1, -1):
            sizes.append(1 << k)
            ds.append(1 << j)
    return (np.asarray(sizes, np.int32), np.asarray(ds, np.int32))


@functools.partial(jax.jit, static_argnames=("num_keys", "n_ops", "R",
                                             "n", "slab_rows",
                                             "interpret"))
def _bitonic_call(stacked, *, num_keys: int, n_ops: int, R: int, n: int,
                  slab_rows: int, interpret: bool):
    """stacked: uint32 [n_ops, B*R, 128]; sorts each row-group of R
    rows (one batch element) ascending by the first num_keys planes.

    The pass schedule lives in SMEM tables and the kernel is ONE
    fori_loop over passes with dynamic-shift rolls — a fully unrolled
    network (120 passes x ~30 ops at N=32k) took many-minute remote
    Mosaic compiles; the looped form is ~60 ops total."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows_total = stacked.shape[1]
    grid = rows_total // slab_rows
    sizes, ds = _pass_tables(n)
    n_passes = len(sizes)

    def kernel(sz_ref, d_ref, x_ref, o_ref):
        S = slab_rows
        row = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        rloc = row & (R - 1)

        def pass_body(i, x):
            size = sz_ref[i]
            d = d_ref[i]

            def lane_case(x):
                bp = pltpu.roll(x, d, axis=2)          # x[.., c-d]
                bm = pltpu.roll(x, 128 - d, axis=2)    # x[.., c+d]
                return bp, bm

            def row_case(x):
                dr = d // 128
                bp = pltpu.roll(x, dr, axis=1)
                bm = pltpu.roll(x, S - dr, axis=1)
                return bp, bm

            is_lane = d < 128
            bp, bm = jax.lax.cond(is_lane, lane_case, row_case, x)
            # bool masks via boolean algebra ONLY — i1 selects (where
            # with bool branches, bool cond results) crash Mosaic
            ibit = ((is_lane & ((lane & d) != 0))
                    | (~is_lane & ((rloc & (d // 128)) != 0)))
            b = jnp.where(ibit[None], bp, bm)
            # direction bit of the local index i = rloc*128 + lane
            is_small = size < 128
            sbit = ((is_small & ((lane & size) != 0))
                    | (~is_small & ((rloc & (size // 128)) != 0)))
            # ascending block & i is the low index -> keep small
            take_small = sbit == ibit
            lt = jnp.zeros((S, 128), bool)
            gt = jnp.zeros((S, 128), bool)
            for l in range(num_keys):
                av, bv = x[l], b[l]
                lt = lt | (~gt & ~lt & (bv < av))
                gt = gt | (~lt & ~gt & (bv > av))
            # NOT jnp.where(take_small, lt, gt): an i1-select with
            # bool branch operands crashes the Mosaic compiler
            # (probed 2026-08-21); plain boolean algebra lowers fine
            take_b = (take_small & lt) | (~take_small & gt)
            return jnp.where(take_b[None], b, x)

        o_ref[:] = jax.lax.fori_loop(0, n_passes, pass_body, x_ref[:])

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_ops, slab_rows, 128),
                         lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_ops, slab_rows, 128),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(stacked.shape, jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(sizes), jnp.asarray(ds), stacked)


def _use_pallas(n_pad: int, n_ops: int, backend: str | None) -> bool:
    import os
    # OPT-IN (GPT_PSORT=1): measured IN SITU the XLA variadic sort
    # beats this kernel at both pipeline shapes — toy 64-gap slice
    # 1766 vs 1376 gaps/s, production 16-gap 125.3 vs 108.4 — even
    # though the isolated microbench (scripts/sortbench.py) shows the
    # kernel 1.4-5x faster at [16, 8k-32k] shapes: XLA fuses/overlaps
    # its sorts with neighboring ops while a pallas_call is an opaque
    # barrier. Kept for future JAX versions + as the measured record.
    if not os.environ.get("GPT_PSORT"):
        return False
    if (backend or jax.default_backend()) != "tpu":
        return False
    if n_pad < _MIN_PALLAS_N or n_pad < 128:
        return False
    R = n_pad // 128
    # one batch row's stacked planes must fit the live-bytes ceiling
    return n_ops * R * 128 * 4 <= _LIVE_MAX


def bitonic_sort(ops, num_keys: int, stable: bool = False,
                 backend: str | None = None, interpret: bool = False):
    """Sort [..., N] operand tuple ascending along the last axis by the
    first `num_keys` operands (lexicographic). Drop-in for
    `jax.lax.sort(ops, dimension=-1, num_keys=num_keys)`.

    Keys may be uint32 or non-negative-range int32 (int32 keys are
    order-mapped through a sign-bit flip, so negatives sort correctly);
    payloads any 32-bit dtype. stable=True appends an index tie-break
    key (equal-key order preserved, like lax.sort is_stable=True).
    """
    ops = tuple(ops)
    assert 1 <= num_keys <= len(ops)
    shape = ops[0].shape
    N = shape[-1]
    n_pad = max(_next_pow2(N), 128)
    n_ops = len(ops) + (1 if stable else 0)

    if not _use_pallas(n_pad, n_ops, backend) and not interpret:
        if stable:
            res = jax.lax.sort(ops, dimension=len(shape) - 1,
                               num_keys=num_keys, is_stable=True)
        else:
            res = jax.lax.sort(ops, dimension=len(shape) - 1,
                               num_keys=num_keys)
        return tuple(res) if isinstance(res, (tuple, list)) else (res,)

    B = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    R = n_pad // 128

    planes = []
    metas = []              # (dtype, signed_key)
    for i, op in enumerate(ops):
        dt = op.dtype
        signed_key = (i < num_keys) and jnp.issubdtype(dt, jnp.signedinteger)
        v = op.reshape(B, N)
        if signed_key:
            v = (v.astype(jnp.int32).view(jnp.uint32)
                 ^ jnp.uint32(0x80000000))
        elif dt != jnp.uint32:
            v = v.view(jnp.uint32) if dt.itemsize == 4 else \
                v.astype(jnp.uint32)
        pad_val = jnp.uint32(0xFFFFFFFF) if i < num_keys else jnp.uint32(0)
        if n_pad != N:
            v = jnp.pad(v, ((0, 0), (0, n_pad - N)),
                        constant_values=pad_val)
        planes.append(v)
        metas.append((dt, signed_key))
    if stable:
        iota = jnp.broadcast_to(
            jnp.arange(n_pad, dtype=jnp.uint32)[None], (B, n_pad))
        planes.insert(num_keys, iota)
        num_keys += 1

    # slab: as many batch rows as fit the live-bytes ceiling, floored
    # to a power of two (keeps slab_rows pow2: R is pow2)
    slab_b = max(1, _LIVE_MAX // (n_ops * R * 128 * 4))
    slab_b = min(slab_b, B)
    slab_b = 1 << (slab_b.bit_length() - 1)
    b_pad = -(-B // slab_b) * slab_b
    stacked = jnp.stack(planes).reshape(n_ops, B, R, 128)
    if b_pad != B:
        stacked = jnp.pad(stacked, ((0, 0), (0, b_pad - B), (0, 0),
                                    (0, 0)))
    stacked = stacked.reshape(n_ops, b_pad * R, 128)

    res = _bitonic_call(stacked, num_keys=num_keys, n_ops=n_ops, R=R,
                        n=n_pad, slab_rows=slab_b * R,
                        interpret=interpret)
    res = res.reshape(n_ops, b_pad, n_pad)[:, :B, :N]

    out = []
    oi = 0
    for pi in range(n_ops):
        if stable and pi == num_keys - 1:
            continue                       # drop the tie-break iota
        dt, signed_key = metas[oi]
        v = res[pi]
        if signed_key:
            v = (v ^ jnp.uint32(0x80000000)).view(jnp.int32)
        elif dt != jnp.uint32:
            v = v.view(dt) if dt.itemsize == 4 else v.astype(dt)
        out.append(v.reshape(shape))
        oi += 1
    return tuple(out)
