"""Device-side bench worker: SW kernel + fused-slice measurements in
ONE process (device init + first tunnel transfer cost ~100 s on the
axon-tunneled TPU, so everything device-side shares a single process).

Writes results INCREMENTALLY to --out=FILE (full JSON dict rewritten
after each sub-measurement, flushed) so a parent that kills this
process on timeout still gets whatever finished. Also prints the final
dict to stdout.

Measurement order: SW kernel first (cheap, cache-warm), slice second
(the headline, but carries cold-compile risk).

All numbers are slope-timed (docs/kernel-notes.md): K dependency-
chained steps in one jit, forced readback, best-of-N,
(t(K_hi)-t(K_lo))/(K_hi-K_lo).
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

import numpy as np

RESULT = {}
OUT_PATH = None


def emit():
    if OUT_PATH:
        tmp = OUT_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(RESULT, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, OUT_PATH)


def sw_numbers():
    import jax
    import jax.numpy as jnp
    from gappadder_tpu.ops import sw_host, sw_pallas, sw_xla
    from gappadder_tpu.ops.sw_host import SWParams

    on_tpu = jax.default_backend() == "tpu"
    B, Lq, Lt = 512, 128, 1024
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (B, Lq)).astype(np.int8)
    t = rng.integers(0, 4, (B, Lt)).astype(np.int8)
    qd, td = jax.device_put(q), jax.device_put(t)
    qld = jax.device_put(np.full(B, Lq, np.int32))
    tld = jax.device_put(np.full(B, Lt, np.int32))
    params = SWParams(1, -4, 7, 1)

    if on_tpu:
        kern = lambda q, t: sw_pallas.sw_batch_pallas(
            q, qld, t, tld, params, "local")
    else:
        kern = lambda q, t: sw_xla.sw_batch(q, qld, t, tld, params,
                                            "local")

    def make_chain(K):
        @jax.jit
        def chained(q, t):
            s = jnp.zeros((), jnp.int32)
            for _ in range(K):
                w = jnp.where(s < 0, 1, 0).astype(jnp.int8)  # 0 at runtime
                sc, _, _ = kern(q + w, t)
                s = s + sc.sum()
            return s
        return chained

    # K_hi = 33: at ~1M pairs/s the 33-step chain runs ~16 ms on
    # device, an order of magnitude above the tunnel's best-of-N RTT
    # jitter — the K=9 slope swung 93-135 GCUPS between runs
    times = {}
    for K in (1, 33):
        fn = make_chain(K)
        np.asarray(fn(qd, td))                    # compile + warm
        best = float("inf")
        for _ in range(7):                        # best-of-7 denoises tunnel
            t0 = time.time()
            np.asarray(fn(qd, td))                # fetch forces completion
            best = min(best, time.time() - t0)
        times[K] = best
    dt = (times[33] - times[1]) / 32

    nb = 4                                        # live numpy DP baseline
    t0 = time.time()
    for i in range(nb):
        sw_host.dp_matrices(q[i], t[i], params, "local")
    base_dt = (time.time() - t0) / nb

    return {
        "sw_reads_aligned_per_s": round(B / dt, 1),
        "sw_gcups": round(B * Lq * Lt / dt / 1e9, 1),
        "sw_impl": "pallas-tpu" if on_tpu else f"xla-{jax.default_backend()}",
        "sw_vs_numpy_host": round((B / dt) * base_dt, 1),
    }


def main():
    global OUT_PATH
    gaps = 16
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            OUT_PATH = a.split("=", 1)[1]
        if a.startswith("--gaps="):
            gaps = int(a.split("=", 1)[1])

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    t0 = time.time()
    RESULT["backend"] = jax.default_backend()
    RESULT["device_init_s"] = round(time.time() - t0, 1)
    emit()

    try:
        RESULT.update(sw_numbers())
    except Exception as e:  # noqa: BLE001
        RESULT["sw_error"] = str(e)[:300]
    emit()

    try:
        from slice_bench import measure
        row = measure(1, gaps_per_shard=gaps)
        RESULT["slice"] = {k: (round(v, 2) if isinstance(v, float) else v)
                           for k, v in row.items()}
    except Exception as e:  # noqa: BLE001
        RESULT["slice_error"] = str(e)[:300]
    emit()

    # production-shape row (VERDICT r3 next #3): six (k, sub_k)
    # settings, 300 bp flanks, 100 bp reads, skewed 100-1000 bp gaps —
    # measured last (longest compile; the incremental file keeps the
    # rows above if the parent kills us)
    if "--no-production" not in sys.argv:
        try:
            row = measure(1, gaps_per_shard=16, production=True)
            RESULT["slice_production"] = {
                k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in row.items()}
        except Exception as e:  # noqa: BLE001
            RESULT["slice_production_error"] = str(e)[:300]
        emit()
    print(json.dumps(RESULT))


if __name__ == "__main__":
    main()
