"""Whole-pipeline stress run on a synthetic draft (BASELINE config 3
shape, scaled down): N scaffolds, many gaps, one PE library.

Usage: python scripts/stress_pipeline.py [n_gaps] [scaffold_kb] [--cpu]
Prints per-stage timings, closure rate, and gaps/s.
"""

import os
import pathlib
import sys
import tempfile
import time

_ROOT = pathlib.Path(os.environ.get("GPT_ROOT",
                                    pathlib.Path(__file__).resolve().parent.parent)
                     if "__file__" in globals() else os.getcwd())
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        sys.argv.remove("--cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(_ROOT / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    n_gaps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    scaf_kb = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from gappadder_tpu import dna
    from gappadder_tpu.config import Config, Library, TpuParams
    from gappadder_tpu.io import bam as bam_io, fasta
    from gappadder_tpu.pipeline import collect, patch, preprocess, run
    from gappadder_tpu.pipeline.workspace import Workspace
    import read_simulator

    rng = np.random.default_rng(0)
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="gpt_stress_"))
    n_scaf = max(1, n_gaps // 8)
    gaps_per_scaf = n_gaps // n_scaf
    L = scaf_kb * 1000

    truths, drafts, spans_all = [], [], []
    for s in range(n_scaf):
        truth = "".join(np.array(list("ACGT"))[rng.integers(0, 4, L)])
        spans = []
        step = L // (gaps_per_scaf + 1)
        for g in range(gaps_per_scaf):
            gs = (g + 1) * step
            glen = int(rng.integers(100, 400))
            spans.append((gs, gs + glen))
        d = list(truth)
        for a, b in spans:
            d[a:b] = "N" * (b - a)
        truths.append(truth)
        drafts.append("".join(d))
        spans_all.append(spans)

    draft_path = str(tmp / "draft.fa")
    fasta.write_fasta(draft_path, [(f"scaf{i}", d)
                                   for i, d in enumerate(drafts)])

    t0 = time.time()
    all_recs, lfq, rfq = [], [], []
    coverage_pairs = int(30 * L / 200)
    for si, (truth, spans) in enumerate(zip(truths, spans_all)):
        recs, lf, rf = read_simulator.simulate(
            truth, spans, coverage_pairs, rng, read_len=100,
            insert=300, std=30)
        for r in recs:
            r["tid"] = si
            r["mtid"] = si
            r["name"] = f"s{si}_" + r["name"]
        all_recs += recs
        lfq += [(f"s{si}_{n}", s) for n, s in lf]
        rfq += [(f"s{si}_{n}", s) for n, s in rf]
    all_recs.sort(key=lambda r: (r["tid"], r["pos"]))
    bam_path = str(tmp / "lib.bam")
    bam_io.write_bam(bam_path, [(f"scaf{i}", L) for i in range(n_scaf)],
                     all_recs)
    for path, entries in ((tmp / "l.fq", lfq), (tmp / "r.fq", rfq)):
        with open(path, "w") as fh:
            for name, seq in entries:
                fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    print(f"simulate: {time.time()-t0:.1f}s "
          f"({len(all_recs)} records, {n_gaps} gaps)")

    cfg = Config(
        draft_genome=draft_path, min_gap_size=50, flank_length=150,
        working_folder=str(tmp / "work"), kmers=((25, 21), (31, 27)),
        libraries=(Library(bam=bam_path, insert_size=300, std=30,
                           left_fq=str(tmp / "l.fq"),
                           right_fq=str(tmp / "r.fq")),),
        tpu=TpuParams(read_batch=1 << 15))
    ws = Workspace(cfg.workdir)
    genome = fasta.read_fasta(draft_path)

    t0 = time.time()
    gaps = preprocess.run_preprocess(cfg, ws, genome=genome)
    t1 = time.time()
    print(f"preprocess: {t1-t0:.1f}s ({len(gaps['start'])} gaps)")
    rec, readsets = collect.run_collect(cfg, ws, genome=genome)
    t2 = time.time()
    print(f"collect: {t2-t1:.1f}s ({len(rec['gap'])} recruits)")
    fills, exts, _ = run.run_assembly_and_pick(cfg, ws, rec=rec,
                                               readsets=readsets,
                                               genome=genome)
    t3 = time.time()
    print(f"assembly+pick: {t3-t2:.1f}s "
          f"({len(fills)} closed, {len(exts)} extended)")

    # verify closures against truth
    ok = 0
    for g, (seq, _name) in fills.items():
        si = int(gaps["scaffold"][g])
        gs = int(gaps["local_start"][g])
        ge = int(gaps["local_end"][g])
        want = truths[si][gs - cfg.flank_margin: ge + cfg.flank_margin]
        if dna.decode(seq) == want:
            ok += 1
    n = len(gaps["start"])
    print(f"closure: {len(fills)}/{n} picked, {ok}/{n} bit-exact, "
          f"{n/(t3-t1):.2f} gaps/s end-to-end")


if __name__ == "__main__":
    main()
