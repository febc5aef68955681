"""Microbench: jax.lax.sort vs the Pallas bitonic sort at the fused
step's real sort shapes (slope-timed, docs/kernel-notes.md discipline).

Shapes benched (from the production slice anatomy):
  merge-chunk k-mer sort:  [G, R*P + M] x (nl keys + payload)
  DBG endpoint sort:       [G, 2*E]     x (nl keys + payload)

Usage: python scripts/sortbench.py [--cpu] [--impl=xla|pallas|both]
Prints one JSON line per (shape, impl).
"""

import functools
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def slope_time(make_chain, placed, k_lo=1, k_hi=3, repeats=7):
    times = {}
    for K in (k_lo, k_hi):
        f = make_chain(K)
        np.asarray(f(*placed))        # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            np.asarray(f(*placed))
            best = min(best, time.time() - t0)
        times[K] = best
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)


def bench_sort(G, N, nl, impl, rng):
    import jax
    import jax.numpy as jnp

    ops_np = [rng.integers(0, 1 << 32, (G, N), dtype=np.uint32)
              for _ in range(nl)]
    pay_np = np.tile(np.arange(N, dtype=np.int32), (G, 1))
    placed = [jnp.asarray(a) for a in ops_np] + [jnp.asarray(pay_np)]

    if impl == "xla":
        def one(ops):
            return jax.lax.sort(tuple(ops), dimension=1, num_keys=nl)
    else:
        os.environ["GPT_PSORT"] = "1"     # kernel is opt-in by default
        from gappadder_tpu.ops.psort import bitonic_sort

        def one(ops):
            return bitonic_sort(tuple(ops), num_keys=nl)

    def make_chain(K):
        @jax.jit
        def c(*ops):
            ops = list(ops)
            for _ in range(K):
                res = one(ops)
                # dependency chain: perturb first key with payload
                ops[0] = res[0] ^ res[-1].astype(jnp.uint32)
                ops[1:] = list(res[1:])
            return ops[0]
        return c

    return slope_time(make_chain, placed)


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    impls = ["xla", "pallas"]
    for a in sys.argv[1:]:
        if a.startswith("--impl="):
            v = a.split("=")[1]
            impls = ["xla", "pallas"] if v == "both" else [v]

    rng = np.random.default_rng(0)
    # (G, N, nl): k-mer merge sort at k=50 (nl=4), k=30 (nl=2);
    # DBG endpoint sort at sub_k=49 (nl=4) / 27 (nl=2)
    shapes = [(16, 1 << 15, 4), (16, 1 << 15, 2), (16, 1 << 14, 4),
              (16, 1 << 13, 2), (64, 1 << 13, 2)]
    for (G, N, nl) in shapes:
        for impl in impls:
            try:
                t = bench_sort(G, N, nl, impl, rng)
                print(json.dumps({
                    "impl": impl, "G": G, "N": N, "num_keys": nl,
                    "ms": round(t * 1e3, 3),
                    "Melem_per_s": round(G * N / t / 1e6, 1),
                    "backend": jax.default_backend()}), flush=True)
            except Exception as e:
                print(json.dumps({"impl": impl, "G": G, "N": N,
                                  "num_keys": nl,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
