"""CLI: drop-in equivalent of the reference's main.py.

    gappadder-tpu -c {Clean,All,Preprocess,Collect,Assembly,Patch} -g config.json

Same command names and JSON schema as the reference
(/root/reference/main.py:15-23); `Patch` is additionally wired in
(the reference leaves put_gap_seq_back_to_scaffold.py as a manual
step).
"""

from __future__ import annotations

import argparse
import shutil
import sys

from .config import load_config
from .io import fasta
from .pipeline import collect, patch, preprocess, run
from .pipeline.workspace import Workspace


def main(argv=None):
    p = argparse.ArgumentParser(prog="gappadder-tpu",
                                description="TPU-native gap closing")
    p.add_argument("-c", "--command", required=True,
                   choices=["Clean", "All", "Preprocess", "Collect",
                            "Assembly", "Patch"])
    p.add_argument("-g", "--config", required=True)
    p.add_argument("--parity-files", action="store_true",
                   help="also write reference-layout text/FASTA files")
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    ws = Workspace(cfg.workdir)
    cmd = args.command

    if cmd in ("Clean",):
        shutil.rmtree(cfg.workdir, ignore_errors=True)
        return 0

    genome = fasta.read_fasta(cfg.draft_genome)
    if cmd in ("Preprocess", "All"):
        table = preprocess.run_preprocess(cfg, ws, genome=genome,
                                          write_parity_files=args.parity_files)
        print(f"[preprocess] {len(table['start'])} gaps")
    if cmd in ("Collect", "All"):
        rec, _ = collect.run_collect(cfg, ws, genome=genome,
                                     write_parity_files=args.parity_files)
        print(f"[collect] {len(rec['gap'])} recruited read assignments")
    if cmd in ("Assembly", "All"):
        fills, exts, _ = run.run_assembly_and_pick(cfg, ws, genome=genome)
        print(f"[assembly] {len(fills)} gaps closed, {len(exts)} extended "
              f"-> {ws.path('picked_seqs.fa')}")
    if cmd in ("Patch", "All"):
        gaps = ws.load_arrays("gaps")
        fills = _fills_from_picked(ws, gaps)
        recs = patch.patch_scaffolds(genome, gaps, fills,
                                     margin=cfg.flank_margin)
        out = ws.path("filled_scaffolds.fa")
        fasta.write_fasta(out, recs)
        print(f"[patch] wrote {out} ({len(fills)} gaps filled)")
    return 0


def _fills_from_picked(ws, gaps):
    """Parse picked_seqs.fa (full closures only) back into fill codes."""
    import os
    path = ws.path("picked_seqs.fa")
    fills = {}
    if not os.path.exists(path):
        return fills
    key = {(int(s), int(n)): i
           for i, (s, n) in enumerate(zip(gaps["scaffold"], gaps["number"]))}
    for name, codes in fasta.iter_fasta(path):
        parts = name.split("_")
        if parts[-1] == "extended":
            continue
        gi = key.get((int(parts[0]), int(parts[1])))
        if gi is not None and gi not in fills:
            fills[gi] = codes
    return fills


if __name__ == "__main__":
    sys.exit(main())
