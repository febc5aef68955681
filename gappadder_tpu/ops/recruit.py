"""Device-side recruitment union: dedup + FASTQ hash join (L2).

Completes the collect dataplane on device: the (gap, side, name-hash)
recruitment records produced by classification are deduplicated and
joined against a library's FASTQ name table with multi-key sorts —
the device equivalent of the host numpy glue in pipeline/collect.py
(which remains the tested oracle). Hashes are 64-bit split into two
uint32 sort keys.

At pod scale this runs sharded: records sort locally per shard, then a
gap-keyed all-to-all would regroup them (SURVEY.md §7 hard part 6);
single-chip semantics are what is implemented and tested here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

I32MAX = jnp.int32(0x7FFFFFFF)


def _split_hash(h):
    h = np.asarray(h, np.uint64)
    return ((h >> np.uint64(32)).astype(np.uint32),
            (h & np.uint64(0xFFFFFFFF)).astype(np.uint32))


@functools.partial(jax.jit, static_argnames=())
def dedup_and_join(rec_gap, rec_side, rec_hi, rec_lo, rec_hq,
                   tbl_hi, tbl_lo, tbl_row, tbl_side):
    """Dedup (gap, side, hash) records and resolve FASTQ rows.

    Args:
      rec_*: int32/uint32 [R] recruitment records (gap == -1 padding);
        rec_hq bool.
      tbl_*: the CONCATENATED left+right FASTQ name tables, sorted by
        (side, hi, lo): uint32 hi/lo, int32 row, int32 side.

    Returns (gap, side, row, hq, valid): int32/bool [R] — one entry per
    surviving unique (gap, side, hash) that found its FASTQ row; padded
    entries have valid False. hq is OR-reduced over duplicates.
    """
    R = rec_gap.shape[0]
    # ---- dedup by (gap, side, hash); OR the hq flags -------------------
    ops = (rec_gap.astype(jnp.int32), rec_side.astype(jnp.int32),
           rec_hi.astype(jnp.uint32), rec_lo.astype(jnp.uint32),
           rec_hq.astype(jnp.int32))
    g, s, hi, lo, hq = jax.lax.sort(ops, dimension=0, num_keys=4)
    prev_same = (jnp.roll(g, 1) == g) & (jnp.roll(s, 1) == s) & \
        (jnp.roll(hi, 1) == hi) & (jnp.roll(lo, 1) == lo)
    prev_same = prev_same.at[0].set(False)
    first = ~prev_same
    # OR of hq over each run: segment-max via cummax keyed by run id
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    hq_or = jax.ops.segment_max(hq, run_id, num_segments=R,
                                indices_are_sorted=True)[run_id]
    keep = first & (g >= 0)

    # ---- join against the FASTQ table by (side, hi, lo) ----------------
    M = tbl_hi.shape[0]
    q_side = jnp.where(keep, s, I32MAX)
    tag = jnp.concatenate([jnp.zeros(M, jnp.int32), jnp.ones(R, jnp.int32)])
    k_side = jnp.concatenate([tbl_side.astype(jnp.int32), q_side])
    k_hi = jnp.concatenate([tbl_hi.astype(jnp.uint32), hi])
    k_lo = jnp.concatenate([tbl_lo.astype(jnp.uint32), lo])
    payload = jnp.concatenate([jnp.arange(M, dtype=jnp.int32),
                               jnp.arange(R, dtype=jnp.int32)])
    trow = jnp.concatenate([tbl_row.astype(jnp.int32),
                            jnp.zeros(R, jnp.int32)])
    rs, rhi, rlo, rtag, rpay, rrow = jax.lax.sort(
        (k_side, k_hi, k_lo, tag, payload, trow), dimension=0, num_keys=4)
    # propagate the last table row + its key forward
    is_tbl = rtag == 0
    idxs = jnp.arange(M + R, dtype=jnp.int32)
    last_tbl = jax.lax.cummax(jnp.where(is_tbl, idxs, -1))
    lt = jnp.clip(last_tbl, 0, M + R - 1)
    matched = (last_tbl >= 0) & (rs[lt] == rs) & (rhi[lt] == rhi) & \
        (rlo[lt] == rlo)
    row_here = jnp.where(matched, rrow[lt], -1)
    # scatter back to record order
    tgt = jnp.where(~is_tbl, rpay, R)
    row_of = jnp.full(R + 1, -1, jnp.int32).at[tgt].set(
        row_here, mode="drop")[:R]

    valid = keep & (row_of >= 0)
    return (jnp.where(valid, g, -1), s, row_of, hq_or.astype(bool), valid)


def recruit_on_device(entries_gap, entries_side, entries_hash, entries_hq,
                      readsets):
    """Host wrapper mirroring collect_library's union step.

    Returns dict with gap/side/row/hq numpy arrays (sorted by gap).
    """
    if len(entries_gap) == 0:
        z = np.zeros(0, np.int32)
        return {"gap": z, "side": z, "row": z, "hq": np.zeros(0, bool)}
    tbl_hi, tbl_lo, tbl_row, tbl_side = [], [], [], []
    for side_val, rs in ((0, readsets[0]), (1, readsets[1])):
        if rs is None or rs.n == 0:
            continue
        hi, lo = _split_hash(rs.name_hash)
        tbl_hi.append(hi)
        tbl_lo.append(lo)
        tbl_row.append(np.arange(rs.n, dtype=np.int32))
        tbl_side.append(np.full(rs.n, side_val, np.int32))
    if not tbl_hi:
        z = np.zeros(0, np.int32)
        return {"gap": z, "side": z, "row": z, "hq": np.zeros(0, bool)}
    hi, lo = _split_hash(entries_hash)
    g, s, row, hq, valid = dedup_and_join(
        jnp.asarray(entries_gap, jnp.int32),
        jnp.asarray(entries_side, jnp.int32),
        jnp.asarray(hi), jnp.asarray(lo),
        jnp.asarray(entries_hq, bool),
        jnp.asarray(np.concatenate(tbl_hi)),
        jnp.asarray(np.concatenate(tbl_lo)),
        jnp.asarray(np.concatenate(tbl_row)),
        jnp.asarray(np.concatenate(tbl_side)))
    g, s, row, hq, valid = map(np.asarray, (g, s, row, hq, valid))
    m = valid
    out = {"gap": g[m].astype(np.int32), "side": s[m].astype(np.int32),
           "row": row[m].astype(np.int32), "hq": hq[m]}
    order = np.lexsort((out["row"], out["side"], out["gap"]))
    return {k: v[order] for k, v in out.items()}
