"""Patch stage: splice picked gap sequences back into the scaffolds.

Equivalent of the reference's manual final step
put_gap_seq_back_to_scaffold.py: each gap's N-run [start, end) is
replaced by its picked fill sequence; gaps without a pick keep their
Ns. Works directly from the explicit gap table instead of re-deriving
gap ids from file headers.
"""

from __future__ import annotations

import numpy as np

from .. import dna
from ..io import fasta


def patch_scaffolds(genome: fasta.Genome, gaps: dict[str, np.ndarray],
                    fills: dict[int, np.ndarray], margin: int = 5):
    """Return list of (name, codes) patched scaffolds.

    fills: {gap_index -> int8 fill codes} (full closures only —
    extensions stay out of the scaffold).

    A picked fill is the contig span between the flank alignments,
    i.e. it covers truth positions [start-margin, end+margin) — the
    flanks deliberately stop `margin` bases short of the N-run
    (gnrt_pos_true_seqs.py:95-99). We splice over exactly that range.
    (The reference's manual patcher splices over [start, end+1),
    duplicating the margins and dropping one base —
    put_gap_seq_back_to_scaffold.py:88-91; fixed here.)
    """
    out = []
    for si, name in enumerate(genome.names):
        seq = genome.scaffold(si)
        pieces = []
        cursor = 0
        for gi in np.nonzero(gaps["scaffold"] == si)[0]:
            if int(gi) not in fills:
                continue
            s = max(int(gaps["local_start"][gi]) - margin, cursor)
            e = min(int(gaps["local_end"][gi]) + margin, len(seq))
            pieces.append(seq[cursor:s])
            pieces.append(np.asarray(fills[int(gi)], np.int8))
            cursor = e
        pieces.append(seq[cursor:])
        out.append((name, np.concatenate(pieces) if len(pieces) > 1
                    else seq))
    return out
