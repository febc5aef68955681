"""Batched interval membership join (focal-region assignment, L2).

The reference hashes EVERY position of every focal window into a dict
and probes it per SAM record (collect_reads_for_gaps.py:31-65,104).
Here the same query — "which gap windows contain this read position" —
is a sort-merge join with fixed fanout:

  1. windows are sorted by (tid, start) and given dense ids;
  2. reads and window-starts are sorted together on (tid, pos, tag)
     (tag orders windows before reads at equal positions so a window
     starting exactly at the read position is counted);
  3. a cumsum of window-tags gives, per read, how many windows start
     at-or-before it (`hi`); scattered back to read order;
  4. the K windows hi-1 … hi-K are gathered and checked
     start <= pos <= end with matching tid.

K is a static bound on how many windows can overlap one position;
the host-side window builder (pipeline/collect.py) computes the true
maximum overlap and picks K, so no hit is ever silently dropped.
Everything is int32 (tid, pos) pairs — no 64-bit global coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INT_MAX = jnp.int32(0x7FFFFFFF)


def sort_windows(tid, start, end, *payloads):
    """Host/device prep: sort windows by (tid, start); returns sorted
    columns (payloads carried along)."""
    res = jax.lax.sort((tid.astype(jnp.int32), start.astype(jnp.int32),
                        end.astype(jnp.int32)) +
                       tuple(p.astype(jnp.int32) for p in payloads),
                       dimension=0, num_keys=2)
    return res


@functools.partial(jax.jit, static_argnames=("fanout",))
def interval_join(rtid, rpos, wtid, wstart, wend, fanout: int = 8):
    """For each read, indices of up to `fanout` windows containing it.

    Args:
      rtid, rpos: int32 [N] read keys.
      wtid, wstart, wend: int32 [W] windows sorted by (tid, start);
        padding rows must have tid == INT_MAX.
      fanout: static max windows per position.

    Returns:
      widx: int32 [N, fanout], window index or -1.
    """
    N = rtid.shape[0]
    W = wtid.shape[0]
    tag = jnp.concatenate([jnp.zeros(W, jnp.int32), jnp.ones(N, jnp.int32)])
    keys_tid = jnp.concatenate([wtid, rtid]).astype(jnp.int32)
    keys_pos = jnp.concatenate([wstart, rpos]).astype(jnp.int32)
    payload = jnp.concatenate([jnp.arange(W, dtype=jnp.int32),
                               jnp.arange(N, dtype=jnp.int32)])
    stid, spos, stag, spay = jax.lax.sort(
        (keys_tid, keys_pos, tag, payload), dimension=0, num_keys=3)
    nwin_before = jnp.cumsum((stag == 0).astype(jnp.int32))
    # scatter hi back to reads
    is_read = stag == 1
    tgt = jnp.where(is_read, spay, N)
    hi = jnp.zeros(N + 1, jnp.int32).at[tgt].set(nwin_before, mode="drop")[:N]

    offs = jnp.arange(fanout, dtype=jnp.int32)
    cand = hi[:, None] - 1 - offs[None, :]                  # [N, K]
    cc = jnp.clip(cand, 0, W - 1)
    ok = (cand >= 0) & (wtid[cc] == rtid[:, None]) & \
         (wstart[cc] <= rpos[:, None]) & (rpos[:, None] <= wend[cc])
    return jnp.where(ok, cand, -1)


def max_overlap_np(tid, start, end) -> int:
    """Host helper: max #windows overlapping any position (to pick K)."""
    import numpy as np
    if len(tid) == 0:
        return 1
    events = []
    for t, s, e in zip(tid, start, end):
        events.append((int(t), int(s), 0))
        events.append((int(t), int(e) + 1, 1))
    events.sort()
    best = cur = 0
    for _, _, kind in events:
        cur += 1 if kind == 0 else -1
        best = max(best, cur)
    return max(best, 1)
