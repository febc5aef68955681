"""Slope-timed benchmark of the fused pipeline slice (the production
collect->assemble->pick dataplane, parallel/slice.py).

Measures gaps/s and alignment-records-classified/s for ONE fused step
at bench shapes, using dependency-chained slope timing (see
docs/kernel-notes.md: on the axon-tunneled TPU only (t(K=hi)-t(K=lo))/
(hi-lo) with a forced host readback is trustworthy).

Importable: measure(n_shards, ...) -> dict.
CLI (subprocess use): python scripts/slice_bench.py [--cpu] [--shards N]
prints one JSON dict.
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


# the reference experiment's six (k, sub_k) settings
# (/root/reference/configuration.json:24-68: k 30/40/50, sub-k pairs)
PRODUCTION_KSET = ((30, 29), (30, 27), (40, 39), (40, 37),
                   (50, 49), (50, 47))


def bench_scenario(n_shards: int, gaps_per_shard: int,
                   skew: bool = False, production: bool = False):
    """A bench-scale planted scenario: denser read tiling and longer
    gaps than the test default (~169 reads/gap, 256bp gaps). With
    skew=True, gap lengths are drawn log-uniformly in [64, 384] (mean
    ~160 bp) — the realistic many-short/long-tail shape; caps pad to
    the longest gap, so the number charges the padding waste too.

    production=True is the REFERENCE-SCALE shape (VERDICT r3 weak #4):
    all six (k, sub_k) settings of the reference chr14 experiment
    (configuration.json), 300 bp flanks, 100 bp reads, skewed
    100-1000 bp gap lengths — ~6x the assembly work per gap of the toy
    row plus the long-tail padding bill."""
    from gappadder_tpu.parallel import dist
    from gappadder_tpu.parallel import slice as sl

    if production:
        dims, args = sl.example_data(
            n_shards, gaps_per_shard=gaps_per_shard, read_len=100,
            step=4, flank_len=300, gap_len=(100, 1000),
            kset=PRODUCTION_KSET, route_impl=dist.default_impl())
        return dims, args
    dims, args = sl.example_data(
        n_shards, gaps_per_shard=gaps_per_shard, read_len=96, step=2,
        flank_len=96, gap_len=(64, 384) if skew else 256,
        route_impl=dist.default_impl())
    return dims, args


def measure(n_shards: int, gaps_per_shard: int = 16,
            k_lo: int = 1, k_hi: int = 5, repeats: int = 5,
            skew: bool = False, production: bool = False):
    """Slope-timed fused-step throughput on the current backend."""
    import jax
    import jax.numpy as jnp
    from gappadder_tpu.parallel import slice as sl
    from gappadder_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(shape=(n_shards,), axes=("dp",),
                     devices=jax.devices()[:n_shards])
    dims, args = bench_scenario(n_shards, gaps_per_shard, skew=skew,
                                production=production)
    placed = sl.place_args(mesh, args)
    n_records = args[0].shape[0]

    import functools
    from gappadder_tpu.parallel.slice import _step
    fn = functools.partial(_step, dims=dims, axis="dp")
    in_specs, out_specs = sl.step_specs(mesh)
    sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)

    def make_chain(K):
        @jax.jit
        def chained(*a):
            s = jnp.zeros((), jnp.int32)
            for _ in range(K):
                w = jnp.where(s < 0, 1, 0).astype(a[1].dtype)  # 0 at runtime
                out = sharded(a[0], a[1] + w, *a[2:])
                s = s + out[0].sum() + out[7].sum().astype(jnp.int32)
            return s
        return chained

    times = {}
    for K in (k_lo, k_hi):
        fn_k = make_chain(K)
        np.asarray(fn_k(*placed))             # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            np.asarray(fn_k(*placed))         # readback forces completion
            best = min(best, time.time() - t0)
        times[K] = best
    dt = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    G = dims.n_gaps
    return {
        "backend": jax.default_backend(),
        "n_shards": n_shards,
        "n_gaps_per_step": G,
        "n_records_per_step": int(n_records),
        "step_seconds": dt,
        "gaps_per_s": G / dt,
        "records_per_s": n_records / dt,
        "route_impl": dims.route_impl,
    }


def main():
    import jax
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
        n_want = 8
        for a in sys.argv[1:]:
            if a.startswith("--shards="):
                n_want = max([n_want] + [int(x) for x in
                                         a.split("=")[1].split(",")])
        jax.config.update("jax_num_cpu_devices", n_want)
    shards = [1]
    gaps = 16
    skew = "--skew" in sys.argv
    production = "--production" in sys.argv
    for a in list(sys.argv[1:]):
        if a.startswith("--shards="):
            shards = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--gaps="):
            gaps = int(a.split("=")[1])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    out = [measure(n, gaps_per_shard=gaps, skew=skew,
                   production=production) for n in shards]
    if skew:
        for r in out:
            r["scenario"] = "skewed gap lengths log-uniform 64-384"
    if production:
        for r in out:
            r["scenario"] = ("production shape: six (k,sub_k) "
                             "30/40/50, 300bp flanks, 100bp reads, "
                             "skewed 100-1000bp gaps")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
