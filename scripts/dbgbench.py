"""A/B microbench of the DBG assemble block at the production shape.

Variants:
  persetting  one assemble_unitigs call per (k, sub_k)  (round-4 path)
  multi       one assemble_unitigs_multi call (all settings batched)
Both with / without the Pallas bitonic sort (GPT_PSORT=1 to enable).

Usage: python scripts/dbgbench.py [--cpu] [--gaps=16] [--variant=both]
Prints one JSON line per variant (slope-timed).
"""

import functools
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    gaps = 16
    variants = ["persetting", "multi"]
    for a in sys.argv[1:]:
        if a.startswith("--gaps="):
            gaps = int(a.split("=")[1])
        if a.startswith("--variant="):
            v = a.split("=")[1]
            if v != "both":
                variants = [v]
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from gappadder_tpu import dna
    from gappadder_tpu.ops import dbg
    from gappadder_tpu.parallel.slice import SliceDims
    from slice_bench import PRODUCTION_KSET

    # production-shape distinct-kmer tables: synthesize G gaps of
    # contiguous region sequence, take their distinct canonical k-mers
    rng = np.random.default_rng(0)
    dims = SliceDims(n_shards=1, n_gaps=gaps, gaps_per_shard=gaps,
                     entry_cap=1, reads_per_gap=1, kset=PRODUCTION_KSET,
                     max_distinct=2048)
    M = dims.max_distinct
    kstrs, nks, kcnts = {}, {}, {}
    for k in sorted({k for k, _ in dims.kset}):
        arr = np.full((gaps, M, k), dna.N, np.int8)
        nk = np.zeros(gaps, np.int32)
        for g in range(gaps):
            region = rng.integers(0, 4, 1184).astype(np.int8)
            seen = set()
            rows = []
            for i in range(len(region) - k + 1):
                s = bytes(region[i:i + k])
                rc = bytes(dna.revcomp(region[i:i + k]))
                key = min(s, rc)
                if key not in seen:
                    seen.add(key)
                    rows.append(np.frombuffer(key, np.int8))
            rows = rows[:M]
            for j, r in enumerate(rows):
                arr[g, j] = r
            nk[g] = len(rows)
        kstrs[k] = jnp.asarray(arr)
        nks[k] = jnp.asarray(nk)
        kcnts[k] = jnp.asarray(np.ones((gaps, M), np.int32))

    ncap = 4096  # right-sized: ~2*region_len + margin (the shipped path derives this from observed nk)
    mu, Lc, ml = 4, 2048, 40

    def run_persetting(w):
        outs = []
        for (k, sk) in dims.kset:
            outs.append(dbg.assemble_unitigs(
                kstrs[k], nks[k] + w, kcnts[k], k=k, sub_k=sk,
                max_unitigs=mu, max_len=Lc, min_len=ml,
                node_cap=ncap,
                edge_cap=ncap))
        return outs

    def run_multi(w):
        return dbg.assemble_unitigs_multi(
            tuple(kstrs[k] for k, _ in dims.kset),
            tuple(nks[k] + w for k, _ in dims.kset),
            tuple(kcnts[k] for k, _ in dims.kset),
            settings=dims.kset, max_unitigs=mu, max_len=Lc,
            min_len=ml, node_cap=ncap, edge_cap=ncap)

    def slope(fn, k_lo=1, k_hi=3, repeats=7):
        def chain(K):
            @jax.jit
            def c(x):
                s = x
                for _ in range(K):
                    # w == 0 always, but data-dependent on the previous
                    # iteration: the K copies cannot be deduped/hoisted
                    w = jnp.where(s < 0, 1, 0).astype(jnp.int32)
                    outs = fn(w)
                    s = sum(jnp.sum(o[1]) for o in outs) + s
                return s
            return c
        times = {}
        for K in (k_lo, k_hi):
            f = chain(K)
            np.asarray(f(jnp.int32(0)))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                np.asarray(f(jnp.int32(0)))
                best = min(best, time.time() - t0)
            times[K] = best
        return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)

    for v in variants:
        fn = run_persetting if v == "persetting" else run_multi
        t = slope(fn)
        print(json.dumps({
            "variant": v, "gaps": gaps,
            "psort": bool(os.environ.get("GPT_PSORT")),
            "ms": round(t * 1e3, 2),
            "gaps_per_s_equiv": round(gaps / t, 1),
            "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
