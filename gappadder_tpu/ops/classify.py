"""Read classification against gap focal windows (L2).

Vectorized port of the reference's streaming SAM classifier
(collect_reads_for_gaps.py:68-263) and the low-mapq second pass
(collect_discordant_low_mapq_reads.py:31-81). One elementwise pass
over [N, K] (read x candidate-window) pairs replaces the per-record
Python dict probes.

Coordinate conventions (derived from the reference, which compares
1-based SAM positions against 0-based gap coordinates — the shifts
below reproduce its behavior exactly, in 0-based terms):

  gap-edge windows (dist2 = insert_size + 3*std, clip zone = clip_dist):
    edge 0 (left of gap):  pos in [gstart - dist2,  gstart - 1]
        clip zone ("0c"):  pos >= gstart - clip_dist - 1
    edge 1 (right of gap): pos in [gend - 1, gend + dist2 - 2]
        clip zone ("1c"):  pos <= gend + clip_dist - 1

  records per (read, window) hit:
    clip:   edge0 & right-clipped | edge1 & left-clipped, inside the
            clip zone; recruits the read ITSELF
    discordant: both-mapped, mapq >= anchor_mapq, and mate on another
            scaffold or |tlen| >= dist2 (short-insert libraries also
            |tlen| <= dist1 = insert_size - 3*std); recruits the MATE;
            also records the mate position for the low-mapq pass
    unmap:  read mapped, mate unmapped; recruits the MATE

  side: 0 = recruited read is first-in-pair (left FASTQ), 1 = second.

  low-mapq pass: reads with mapq == 0 whose position falls in
  [mp - 199, mp + 299] of a recorded discordant mate position mp; when
  several mate windows cover the position, only the LARGEST mp wins
  (the reference's dict-overwrite behavior); recruits the read itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .intervals import interval_join


def build_gap_windows(gap_scaffold, gap_start, gap_end, dist2: int,
                      clip_dist: int):
    """Window table: 2 rows per gap (edge 0, edge 1), 0-based bounds.

    Returns dict of int32 arrays [2G]: tid, start, end, gap, edge.
    Not yet sorted — pipeline sorts via intervals.sort_windows.
    """
    g = gap_scaffold.shape[0]
    tid = jnp.tile(gap_scaffold.astype(jnp.int32), 2)
    start = jnp.concatenate([gap_start - dist2, gap_end - 1]).astype(jnp.int32)
    end = jnp.concatenate([gap_start - 1, gap_end + dist2 - 2]).astype(jnp.int32)
    gap = jnp.tile(jnp.arange(g, dtype=jnp.int32), 2)
    edge = jnp.concatenate([jnp.zeros(g, jnp.int32), jnp.ones(g, jnp.int32)])
    return {"tid": tid, "start": start, "end": end, "gap": gap, "edge": edge}


@functools.partial(jax.jit, static_argnames=("fanout", "short_insert",
                                             "dist1", "dist2", "clip_dist",
                                             "anchor_mapq"))
def classify_reads(tid, pos, flag, mapq, mtid, mpos, tlen, lclip, rclip,
                   wtid, wstart, wend, wgap, wedge,
                   gap_start, gap_end,
                   *, dist1: int, dist2: int, clip_dist: int,
                   anchor_mapq: int, short_insert: bool, fanout: int = 8):
    """Classify one batch of alignment records.

    Window arrays must be sorted by (tid, start) with INT_MAX padding.
    gap_start/gap_end are per-gap coordinates indexed by wgap.

    Returns dict with [N, K] arrays:
      widx: window index or -1
      clip / disc / unmap: bool masks
      side_self / side_mate: int32 0(left fastq)/1(right)
    """
    widx = interval_join(tid, pos, wtid, wstart, wend, fanout=fanout)
    hit = widx >= 0
    wc = jnp.clip(widx, 0, wtid.shape[0] - 1)
    edge = wedge[wc]
    gap = wgap[wc]
    gs = gap_start[jnp.clip(gap, 0, gap_start.shape[0] - 1)]
    ge = gap_end[jnp.clip(gap, 0, gap_end.shape[0] - 1)]

    pos_k = pos[:, None]
    in_c = jnp.where(edge == 0,
                     pos_k >= gs - clip_dist - 1,
                     pos_k <= ge + clip_dist - 1)

    is_first = (flag & 0x40) != 0
    self_mapped = (flag & 0x4) == 0
    mate_mapped = (flag & 0x8) == 0

    lclip_k = (lclip > 0)[:, None]
    rclip_k = (rclip > 0)[:, None]
    clip_ok = jnp.where(edge == 0, rclip_k, lclip_k)
    clip = hit & in_c & clip_ok

    cross = (mtid != tid) | (mtid < 0)
    far = jnp.abs(tlen) >= dist2
    near = jnp.abs(tlen) <= dist1
    len_disc = (far | near) if short_insert else far
    disc1 = self_mapped & mate_mapped & (mapq >= anchor_mapq) & \
        (cross | len_disc)
    disc = hit & disc1[:, None]

    unmap1 = self_mapped & ~mate_mapped
    unmap = hit & unmap1[:, None]

    side_self = jnp.where(is_first, 0, 1).astype(jnp.int32)[:, None] \
        * jnp.ones_like(widx)
    side_mate = 1 - side_self
    return {"widx": widx, "gap": jnp.where(hit, gap, -1), "clip": clip,
            "disc": disc, "unmap": unmap,
            "side_self": side_self, "side_mate": side_mate}


@functools.partial(jax.jit, static_argnames=("fanout",))
def classify_lowmapq(tid, pos, flag, mapq,
                     mwtid, mwstart, mwend, mwgap, mwpos,
                     fanout: int = 8):
    """Low-mapq second pass against discordant mate windows.

    mw* arrays: one row per (mate window, linked gap), sorted by
    (tid, start), INT_MAX padded; mwpos is the recorded mate position
    (for the max-mp tie-break).

    Returns [N, K]: gap (or -1) and side_self [N].
    """
    eligible = mapq == 0          # reference: `if map_quality>0: continue`
    widx = interval_join(tid, pos, mwtid, mwstart, mwend, fanout=fanout)
    hit = (widx >= 0) & eligible[:, None]
    wc = jnp.clip(widx, 0, mwtid.shape[0] - 1)
    mp = jnp.where(hit, mwpos[wc], -1)
    best = jnp.max(mp, axis=1, keepdims=True)
    keep = hit & (mp == best)
    gap = jnp.where(keep, mwgap[wc], -1)
    is_first = (flag & 0x40) != 0
    side_self = jnp.where(is_first, 0, 1).astype(jnp.int32)
    return gap, side_self
