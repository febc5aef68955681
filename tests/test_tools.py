import numpy as np

from gappadder_tpu import dna
from gappadder_tpu.io import bam as bam_io, fasta
from gappadder_tpu.ops import coverage
from gappadder_tpu.tools import evaluate, refiner, scaffold


class FakeAln:
    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, np.asarray(v))


def test_coverage_with_cutoff():
    # two contigs, len 100 and 50; 3 qualifying reads on c0
    aln = FakeAln(tid=[0, 0, 0, 1, 0], nmatch=[50, 50, 100, 25, 10],
                  read_len=[50, 50, 100, 25, 100],
                  pos=[0, 50, 0, 0, 0], flag=[0] * 5, mapq=[60] * 5,
                  mtid=[-1] * 5, mpos=[0] * 5, tlen=[0] * 5,
                  lclip=[0] * 5, rclip=[0] * 5)
    cov = refiner.coverage_with_cutoff(aln, [100, 50], cutoff=0.99)
    assert cov[0] == (50 + 50 + 100) / 100  # read with M=10/100 excluded
    assert cov[1] == 0.5


def test_per_base_coverage():
    mean, covered = coverage.per_base_coverage(
        np.array([0, 0]), np.array([0, 50]), np.array([50, 50]), [100])
    assert mean[0] == 1.0 and covered[0] == 100
    mean, covered = coverage.per_base_coverage(
        np.array([0, 0]), np.array([0, 0]), np.array([50, 50]), [100])
    assert mean[0] == 1.0 and covered[0] == 50


def test_refine_by_reads():
    aln = FakeAln(tid=[0] * 4 + [1] * 4,
                  lclip=[0, 0, 0, 0, 20, 20, 20, 0],
                  rclip=[0] * 8,
                  nmatch=[100] * 8, read_len=[100] * 8)
    keep = refiner.refine_by_reads(aln, [500, 500], cf_cutoff=0.5)
    assert keep == [0]


def test_unique_names():
    assert refiner.unique_names(["a", "b", "a", "c"]) == [0, 1, 3]


def test_classify_repeat(rng):
    a = rng.integers(0, 4, 120).astype(np.int8)
    fwd, f, r = refiner.classify_repeat(a, a)
    assert fwd == "forward"
    rc, f, r = refiner.classify_repeat(a, dna.revcomp(a))
    assert rc == "reverse"
    other = rng.integers(0, 4, 120).astype(np.int8)
    none, f, r = refiner.classify_repeat(a, other)
    assert none == "none"


def test_linkage_and_scaffolding(rng):
    # contigs A, B adjacent on the true sequence, PE links span them
    truth = rng.integers(0, 4, 600).astype(np.int8)
    A, B = truth[:300].copy(), truth[310:].copy()
    # simulate 10 pairs linking A(tid 0) -> B(tid 1)
    aln = FakeAln(
        tid=[0] * 10, mtid=[1] * 10, pos=list(range(200, 250, 5)),
        mapq=[60] * 10, flag=[0x1] * 10,
        nmatch=[100] * 10, read_len=[100] * 10, lclip=[0] * 10,
        rclip=[0] * 10, mpos=[10] * 10, tlen=[0] * 10)
    links = refiner.cnt_contig_linkage(aln, [300, 290], ["A", "B"],
                                       insert_size=150, sd=20)
    assert len(links) == 1 and links[0][6] == 10
    recs, used = scaffold.build_scaffolds([A, B], ["A", "B"], links)
    assert len(recs) == 1
    name, seq = recs[0]
    assert name.startswith("scaffold_0")
    assert len(seq) >= len(A) + len(B)


def test_true_gap_extraction_and_closure(tmp_path, rng):
    truth = rng.integers(0, 4, 1200).astype(np.int8)
    gs, ge = 500, 650
    finished = fasta.Genome(
        seq=truth, offsets=np.array([0]), lengths=np.array([len(truth)]),
        names=["fin0"])
    gaps = {"start": np.array([gs]), "end": np.array([ge]),
            "scaffold": np.array([0]), "number": np.array([1]),
            "local_start": np.array([gs]), "local_end": np.array([ge])}
    FL = 100
    flank_left = truth[gs - FL:gs - 5][None, :]
    flank_right = truth[ge + 5:ge + FL][None, :]
    lens = (np.array([FL - 5]), np.array([FL - 5]))
    truths = evaluate.extract_true_gap_seqs(gaps, finished, flank_left,
                                            flank_right, lens)
    assert 0 in truths
    np.testing.assert_array_equal(truths[0], truth[gs - 5:ge + 5])

    stats = evaluate.closure_stats({0: truth[gs - 5:ge + 5].copy()}, truths)
    assert stats["hit_list"] == [0]
    # a wrong fill is not counted
    bad = rng.integers(0, 4, 150).astype(np.int8)
    stats2 = evaluate.closure_stats({0: bad}, truths)
    assert stats2["hit_list"] == []
