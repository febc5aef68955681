"""Benchmark: batched Smith-Waterman throughput on the real chip.

The SW overlap/local DP is the reference pipeline's #1 hot loop
(SURVEY.md §3 "Hot loops"): every contig-pair merge, flank pick and
read-rescue verification runs through it. This measures the device
kernel at flank-pick shapes and reports reads-aligned/s (one "read
alignment" = one 128x1024 local DP), with the live single-host numpy
wavefront DP (the same algorithm the CPU reference would run) as the
baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import os
    import jax
    # persistent compilation cache: remote TPU compiles via the tunnel
    # can take minutes; warm runs then load from disk
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from gappadder_tpu.ops import sw_host, sw_pallas, sw_xla
    from gappadder_tpu.ops.sw_host import SWParams

    on_tpu = jax.default_backend() == "tpu"
    B, Lq, Lt = 512, 128, 1024
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (B, Lq)).astype(np.int8)
    t = rng.integers(0, 4, (B, Lt)).astype(np.int8)
    ql = np.full(B, Lq, np.int32)
    tl = np.full(B, Lt, np.int32)
    params = SWParams(1, -4, 7, 1)

    if on_tpu:
        fn = lambda: sw_pallas.sw_batch_pallas(
            jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
            jnp.asarray(tl), params, "local", batch_tile=256)
    else:
        fn = lambda: sw_xla.sw_batch(
            jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
            jnp.asarray(tl), params, "local")

    jax.block_until_ready(fn())          # compile
    t0 = time.time()
    iters = 8
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    cells = B * Lq * Lt
    reads_per_s = B / dt
    gcups = cells / dt / 1e9

    # live CPU baseline: same wavefront DP in numpy, one pair, scaled
    nb = 4
    t0 = time.time()
    for i in range(nb):
        sw_host.dp_matrices(q[i], t[i], params, "local")
    base_dt_per_pair = (time.time() - t0) / nb
    base_reads_per_s = 1.0 / base_dt_per_pair

    print(json.dumps({
        "metric": "sw_reads_aligned_per_s",
        "value": round(reads_per_s, 1),
        "unit": f"128x1024 local DP/s ({'pallas-tpu' if on_tpu else 'xla-' + jax.default_backend()}, {gcups:.1f} GCUPS)",
        "vs_baseline": round(reads_per_s / base_reads_per_s, 1),
    }))


if __name__ == "__main__":
    main()
