"""Literal Python-3 oracle of the reference Collect semantics.

Re-implements collect_reads_for_gaps.py, run_multi_threads_discordant's
region inversion, and collect_discordant_low_mapq_reads.py as the
reference wrote them (dict-of-positions focal regions, 1-based SAM
coordinates), so the vectorized pipeline can be tested for parity.

Input records here carry 1-BASED positions (like SAM text), matching
what the reference scripts consume.
"""

from __future__ import annotations


def is_clipped(lclip: int, rclip: int) -> int:
    """0 none, 1 left, 2 right, 3 both (reference is_clipped)."""
    cnt = 2 if rclip > 0 else 0
    if lclip > 0:
        cnt += 1
    return cnt


def focal_region_v2(gaps_on_scaffold, dist2, dist_clip):
    """gaps_on_scaffold: list of (start, end) 0-based, in file order.
    Returns {pos: {(gapnum, tag): 1}} with tags '0c','0d','1c','1d';
    gapnum starts at 1."""
    focal = {}
    for cnt, (start, end) in enumerate(gaps_on_scaffold, 1):
        for i in range(dist2):
            if start - i >= 0:
                tag = "0c" if i <= dist_clip else "0d"
                focal.setdefault(start - i, {})[(cnt, tag)] = 1
            tag = "1c" if i <= dist_clip else "1d"
            focal.setdefault(end + i, {})[(cnt, tag)] = 1
    return focal


def classify_scaffold(records, gaps_on_scaffold, *, insert_size, std,
                      dist_clip, anchor_mapq):
    """records: list of dicts with keys name, flag, pos1 (1-based), mapq,
    mate_ref_same (bool), mate_scaffold (name or None), mate_pos1, tlen,
    lclip, rclip.  Returns (left_list, right_list) of record tuples
    mirroring the reference list files:
      ('clip'|'unmap', name, gapnum, mapq) or
      ('discordant', name, gapnum, mapq, pos1, mate_scaffold, mate_pos1)
    """
    dist1 = insert_size - 3 * std
    dist2 = insert_size + 3 * std
    short_is = insert_size < 750
    focal = focal_region_v2(gaps_on_scaffold, dist2, dist_clip)
    left, right = [], []
    for r in records:
        bfirst = (r["flag"] & 0x40) != 0
        hits = focal.get(r["pos1"])
        if not hits:
            continue
        for (gapnum, tag) in hits:
            clip_flag = is_clipped(r["lclip"], r["rclip"])
            if (tag == "0c" and clip_flag >= 2) or \
               (tag == "1c" and clip_flag in (1, 3)):
                (left if bfirst else right).append(
                    ("clip", r["name"], gapnum, r["mapq"]))
            if (r["flag"] & 0x4) == 0 and (r["flag"] & 0x8) == 0 \
                    and r["mapq"] >= anchor_mapq:
                if not r["mate_ref_same"]:
                    rec = ("discordant", r["name"], gapnum, r["mapq"],
                           r["pos1"], r["mate_scaffold"], r["mate_pos1"])
                    (right if bfirst else left).append(rec)
                else:
                    ti = abs(r["tlen"])
                    cond = ti >= dist2 or (short_is and ti <= dist1)
                    if cond:
                        rec = ("discordant", r["name"], gapnum, r["mapq"],
                               r["pos1"], "=", r["mate_pos1"])
                        (right if bfirst else left).append(rec)
            elif (r["flag"] & 0x4) == 0 and (r["flag"] & 0x8) != 0:
                (right if bfirst else left).append(
                    ("unmap", r["name"], gapnum, r["mapq"]))
    return left, right


def invert_discordant(per_scaffold_lists, scaffold_index):
    """per_scaffold_lists: {scaffold_name: (left, right)}.
    Returns {mate_scaffold_name: sorted list of (mate_pos1, this_scaffold_idx,
    gapnum)} mirroring discordant_temp/<scaffold>.list."""
    collected = {}
    for sname, (left, right) in per_scaffold_lists.items():
        i_id = scaffold_index[sname]
        for lst in (left, right):
            for rec in lst:
                if rec[0] != "discordant":
                    continue
                _, name, gapnum, mapq, pos1, mref, mpos1 = rec
                mname = sname if mref == "=" else mref
                key = (scaffold_index[mname], mpos1)
                collected.setdefault(key, []).append((i_id, gapnum))
    out = {}
    for (mid, mpos1), links in collected.items():
        for (sid, gapnum) in links:
            out.setdefault(mid, []).append((mpos1, sid, gapnum))
    for mid in out:
        out[mid].sort()
    return out


def lowmapq_pass(records_by_scaffold, inverted, scaffold_index,
                 scaffold_names):
    """Second streaming pass. records: same dicts as classify_scaffold,
    grouped per scaffold. Returns (left, right) lists of
    (name, this_scaffold_idx, gapnum, mapq=0)."""
    left, right = [], []
    for sname, records in records_by_scaffold.items():
        sid = scaffold_index[sname]
        entries = inverted.get(sid)
        if not entries:
            continue
        # build focal dict with overwrite semantics
        focal = {}
        pos_gaps = {}
        pre = -1
        for (mpos1, src_sid, gapnum) in entries:
            if mpos1 != pre:
                pos_gaps[mpos1] = []
            pos_gaps[mpos1].append((src_sid, gapnum))
            for i in range(200):
                if mpos1 - i >= 0:
                    focal[mpos1 - i] = mpos1
            for i in range(300):
                focal[mpos1 + i] = mpos1
            pre = mpos1
        for r in records:
            if r["mapq"] > 0:
                continue
            src = focal.get(r["pos1"])
            if src is None or src not in pos_gaps:
                continue
            bfirst = (r["flag"] & 0x40) != 0
            for (src_sid, gapnum) in pos_gaps[src]:
                rec = (r["name"], src_sid, gapnum, 0)
                (left if bfirst else right).append(rec)
    return left, right


def union_recruits(scaffold_lists, lowmapq_lists, scaffold_index):
    """Mirror merge_dispatch_reads_for_gaps_v2's read->gap union.

    Returns (left_map, right_map): {read_name: {(scaffold_idx, gapnum)}}.
    """
    left_map, right_map = {}, {}
    lml, lmr = lowmapq_lists
    for (name, sid, gapnum, _mq) in lml:
        left_map.setdefault(name, set()).add((sid, gapnum))
    for (name, sid, gapnum, _mq) in lmr:
        right_map.setdefault(name, set()).add((sid, gapnum))
    for sname, (left, right) in scaffold_lists.items():
        sid = scaffold_index[sname]
        for lst, mp in ((left, left_map), (right, right_map)):
            for rec in lst:
                name, gapnum = rec[1], rec[2]
                mp.setdefault(name, set()).add((sid, gapnum))
    return left_map, right_map


def hq_recruits(scaffold_lists, scaffold_index, hq_mapq=60):
    """Mirror dispatch_high_quality_reads_for_gaps (mapq==60 only)."""
    left_map, right_map = {}, {}
    for sname, (left, right) in scaffold_lists.items():
        sid = scaffold_index[sname]
        for lst, mp in ((left, left_map), (right, right_map)):
            for rec in lst:
                if rec[3] != hq_mapq:
                    continue
                mp.setdefault(rec[1], set()).add((sid, rec[2]))
    return left_map, right_map
