import numpy as np
import jax.numpy as jnp
import pytest

from gappadder_tpu import dna
from gappadder_tpu.ops import dbg, kmers


def _kstrings_of(seq: str, k: int):
    """Distinct canonical k-mers of seq, as the reference KMC stage
    would produce (kmc default counts canonical forms)."""
    seen = set()
    out = []
    for p in range(len(seq) - k + 1):
        s = seq[p:p + k]
        if "N" in s:
            continue
        rc = dna.decode(dna.revcomp(dna.encode(s)))
        c = min(s, rc)
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def _run(seqs_kstr, k, sub_k, **kw):
    M = max(len(seqs_kstr), 1)
    arr = np.full((1, M, k), dna.N, np.int8)
    for i, s in enumerate(seqs_kstr):
        arr[0, i] = dna.encode(s)
    out, lens, cnt = dbg.assemble_unitigs(
        jnp.asarray(arr), jnp.asarray([len(seqs_kstr)], jnp.int32),
        k=k, sub_k=sub_k, **kw)
    out, lens, cnt = np.asarray(out[0]), np.asarray(lens[0]), int(cnt[0])
    return [dna.decode(out[i][:lens[i]]) for i in range(cnt)]


def _canon(s):
    rc = dna.decode(dna.revcomp(dna.encode(s)))
    return min(s, rc)


def test_single_path_reconstruction(rng):
    # a random 60bp sequence with unique k-1 overlaps assembles back
    truth = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 60)])
    k, sub_k = 21, 15
    ks = _kstrings_of(truth, k)
    unitigs = _run(ks, k, sub_k, max_unitigs=8, max_len=128, min_len=40)
    assert len(unitigs) >= 1
    # the longest unitig should be the full truth (canonical strand)
    best = max(unitigs, key=len)
    assert _canon(best) == _canon(truth) or truth in best or \
        dna.decode(dna.revcomp(dna.encode(truth))) in best, (best, truth)


def test_min_len_filter(rng):
    truth = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 30)])
    k, sub_k = 21, 15
    ks = _kstrings_of(truth, k)
    unitigs = _run(ks, k, sub_k, max_unitigs=8, max_len=128, min_len=40)
    assert all(len(u) >= 40 for u in unitigs)
    unitigs2 = _run(ks, k, sub_k, max_unitigs=8, max_len=128, min_len=10)
    assert any(_canon(u) == _canon(truth) for u in unitigs2)


def test_branching_splits_unitigs(rng):
    # two sequences sharing a middle segment -> branch point splits chains
    mid = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 30)])
    a = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 30)]) + mid
    b = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 30)]) + mid
    k, sub_k = 21, 15
    ks = sorted(set(_kstrings_of(a, k)) | set(_kstrings_of(b, k)))
    unitigs = _run(ks, k, sub_k, max_unitigs=16, max_len=128, min_len=10)
    # mid segment must appear in some unitig, and no unitig contains both
    # full a and full b
    assert any(_canon(mid[-15:]) in (u + "|" + _canon(u)) or mid[-15:] in u
               or dna.decode(dna.revcomp(dna.encode(mid[-15:]))) in u
               for u in unitigs)
    assert not any(a in u and b in u for u in unitigs)


def test_cycle_handling():
    # perfectly periodic sequence -> DBG cycle; must not hang and must
    # emit something deterministic
    period = "ACGTTGCAGT"
    truth = period * 8
    k, sub_k = 21, 15
    ks = _kstrings_of(truth, k)
    unitigs = _run(ks, k, sub_k, max_unitigs=8, max_len=256, min_len=10)
    assert len(unitigs) >= 1  # cycle broken and emitted


def test_empty_input():
    unitigs = _run([], 21, 15, max_unitigs=4, max_len=64, min_len=40)
    assert unitigs == []


def test_batched_matches_single(rng):
    k, sub_k = 17, 11
    truths = ["".join(np.array(list("ACGT"))[rng.integers(0, 4, 50)])
              for _ in range(3)]
    kss = [_kstrings_of(t, k) for t in truths]
    M = max(len(ks) for ks in kss)
    arr = np.full((3, M, k), dna.N, np.int8)
    cnt = np.zeros(3, np.int32)
    for g, ks in enumerate(kss):
        cnt[g] = len(ks)
        for i, s in enumerate(ks):
            arr[g, i] = dna.encode(s)
    out, lens, n = dbg.assemble_unitigs(
        jnp.asarray(arr), jnp.asarray(cnt), k=k, sub_k=sub_k,
        max_unitigs=8, max_len=128, min_len=10)
    for g in range(3):
        single = _run(kss[g], k, sub_k, max_unitigs=8, max_len=128, min_len=10)
        got = [dna.decode(np.asarray(out[g][i][:int(lens[g][i])]))
               for i in range(int(n[g]))]
        assert got == single
