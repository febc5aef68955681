import numpy as np
import pytest

from gappadder_tpu import dna
from gappadder_tpu.ops import merge_engine
from gappadder_tpu.ops.merge_engine import MergeConfig


def _rand(rng, n):
    return rng.integers(0, 4, n).astype(np.int8)


def test_dedup_exact_and_revcomp(rng):
    a = _rand(rng, 200)
    contigs = [a, a.copy(), dna.revcomp(a), _rand(rng, 150)]
    keep = merge_engine.dedup_contigs(contigs, MergeConfig())
    assert keep == [0, 3]


def test_dedup_contained(rng):
    big = _rand(rng, 400)
    small = big[100:250].copy()
    keep = merge_engine.dedup_contigs([small, big], MergeConfig())
    assert keep == [1]


def test_dedup_keeps_distinct(rng):
    contigs = [_rand(rng, 300), _rand(rng, 300), _rand(rng, 120)]
    keep = merge_engine.dedup_contigs(contigs, MergeConfig())
    assert keep == [0, 1, 2]


def test_merge_two_overlapping(rng):
    truth = _rand(rng, 500)
    a = truth[:300].copy()
    b = truth[250:].copy()
    merged, infos = merge_engine.merge_contigs([a, b], MergeConfig())
    assert merged, "no merge found"
    best = max(merged, key=len)
    canon = min(best.tobytes(), dna.revcomp(best).tobytes())
    want = min(truth.tobytes(), dna.revcomp(truth).tobytes())
    assert canon == want


def test_merge_respects_strand(rng):
    truth = _rand(rng, 500)
    a = truth[:300].copy()
    b = dna.revcomp(truth[250:])     # second contig on other strand
    merged, _ = merge_engine.merge_contigs([a, b], MergeConfig())
    assert merged
    best = max(merged, key=len)
    canon = min(best.tobytes(), dna.revcomp(best).tobytes())
    want = min(truth.tobytes(), dna.revcomp(truth).tobytes())
    assert canon == want


def test_merge_three_chain(rng):
    truth = _rand(rng, 700)
    parts = [truth[:300].copy(), truth[250:520].copy(), truth[470:].copy()]
    merged, _ = merge_engine.merge_contigs(parts, MergeConfig())
    assert merged
    best = max(merged, key=len)
    canon = min(best.tobytes(), dna.revcomp(best).tobytes())
    want = min(truth.tobytes(), dna.revcomp(truth).tobytes())
    assert canon == want


@pytest.mark.parametrize("seed", range(8))
def test_merge_reconstructs_random_chains(seed):
    """Property: a truth split into random overlapping pieces (some
    reverse-complemented, shuffled) merges back to the full truth."""
    rng = np.random.default_rng(seed)
    n_pieces = int(rng.integers(2, 6))
    L = int(rng.integers(400, 900))
    truth = _rand(rng, L)
    cuts = np.sort(rng.choice(np.arange(60, L - 60), n_pieces - 1,
                              replace=False))
    bounds = [0] + list(cuts) + [L]
    pieces = []
    for i in range(n_pieces):
        s = bounds[i]
        e = bounds[i + 1]
        s2 = max(0, s - int(rng.integers(20, 50)))   # overlap prev piece
        p = truth[s2:e].copy()
        if rng.integers(0, 2):
            p = dna.revcomp(p)
        pieces.append(p)
    order = rng.permutation(n_pieces)
    merged, _ = merge_engine.merge_contigs([pieces[i] for i in order],
                                           MergeConfig())
    assert merged, f"no merge (seed={seed})"
    best = max(merged, key=len)
    canon = min(best.tobytes(), dna.revcomp(best).tobytes())
    want = min(truth.tobytes(), dna.revcomp(truth).tobytes())
    assert canon == want, (seed, len(best), L)


def test_merge_rejects_containment(rng):
    big = _rand(rng, 400)
    small = big[100:250].copy()
    merged, _ = merge_engine.merge_contigs([big, small], MergeConfig())
    # containment must not produce a "merge" longer than big
    assert all(len(m) <= len(big) for m in merged)


def test_merge_rejects_short_overlap(rng):
    a = _rand(rng, 200)
    b = np.concatenate([a[-8:], _rand(rng, 200)])  # only 8bp overlap < 12
    merged, _ = merge_engine.merge_contigs([a, b], MergeConfig())
    for m in merged:
        assert len(m) < len(a) + len(b) - 4
