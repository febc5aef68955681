"""SW kernel microbench on real TPU: honest timing methodology probes.

Measures the Pallas kernel at the bench.py shape (512x128x1024 local)
three ways to separate device time from axon-tunnel dispatch artifacts:
  A. identical call, pipelined x8, block at end   (bench.py style)
  B. distinct device-resident inputs per call, pipelined x8
  C. single call, block every call (dispatch-latency bound)
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from gappadder_tpu.ops import sw_pallas
from gappadder_tpu.ops.sw_host import SWParams


def main():
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, Lq, Lt = 512, 128, 1024
    rng = np.random.default_rng(0)
    params = SWParams(1, -4, 7, 1)
    cells = B * Lq * Lt

    def mkbatch(seed):
        r = np.random.default_rng(seed)
        return (jax.device_put(r.integers(0, 4, (B, Lq)).astype(np.int8)),
                jax.device_put(np.full(B, Lq, np.int32)),
                jax.device_put(r.integers(0, 4, (B, Lt)).astype(np.int8)),
                jax.device_put(np.full(B, Lt, np.int32)))

    batches = [mkbatch(s) for s in range(8)]
    fn = lambda qb: sw_pallas.sw_batch_pallas(*qb, params, "local")
    jax.block_until_ready(fn(batches[0]))

    # A: identical input, pipelined
    for trial in range(3):
        t0 = time.time()
        for _ in range(8):
            out = fn(batches[0])
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 8
        print(f"A identical pipelined: {dt*1e3:.3f} ms/batch "
              f"= {cells/dt/1e9:.1f} GCUPS")

    # B: distinct inputs, pipelined
    for trial in range(3):
        t0 = time.time()
        outs = [fn(b) for b in batches]
        jax.block_until_ready(outs[-1])
        dt = (time.time() - t0) / 8
        print(f"B distinct  pipelined: {dt*1e3:.3f} ms/batch "
              f"= {cells/dt/1e9:.1f} GCUPS")

    # C: blocking per call
    for trial in range(3):
        t0 = time.time()
        for i in range(4):
            jax.block_until_ready(fn(batches[i % 8]))
        dt = (time.time() - t0) / 4
        print(f"C distinct  blocking : {dt*1e3:.3f} ms/batch "
              f"= {cells/dt/1e9:.1f} GCUPS")


if __name__ == "__main__":
    main()


def dependency_chain():
    """Chain each call's output into the next call's input: the device
    cannot overlap or elide anything. Also verifies results vs XLA."""
    import os
    B, Lq, Lt = 512, 128, 1024
    rng = np.random.default_rng(0)
    params = SWParams(1, -4, 7, 1)
    cells = B * Lq * Lt
    q = jax.device_put(rng.integers(0, 4, (B, Lq)).astype(np.int8))
    t = jax.device_put(rng.integers(0, 4, (B, Lt)).astype(np.int8))
    ql = jax.device_put(np.full(B, Lq, np.int32))
    tl = jax.device_put(np.full(B, Lt, np.int32))

    @jax.jit
    def chained(q, t):
        s = jnp.zeros((), jnp.int32)
        for _ in range(8):
            sc, qe, te = sw_pallas.sw_batch_pallas(
                (q + (s % 2)).astype(jnp.int8) % 4, ql, t, tl,
                params, "local")
            s = s + sc.sum()
        return s
    r = chained(q, t)
    jax.block_until_ready(r)
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(chained(q, t))
        dt = (time.time() - t0) / 8
        print(f"D chained in one jit : {dt*1e3:.3f} ms/batch "
              f"= {cells/dt/1e9:.1f} GCUPS")

    # correctness on hardware vs XLA implementation
    from gappadder_tpu.ops import sw_xla
    s1, q1, t1 = sw_pallas.sw_batch_pallas(q, ql, t, tl, params, "local")
    s2, q2, t2 = sw_xla.sw_batch(q, ql, t, tl, params, "local")
    ok = (np.array_equal(np.asarray(s1), np.asarray(s2)) and
          np.array_equal(np.asarray(q1), np.asarray(q2)) and
          np.array_equal(np.asarray(t1), np.asarray(t2)))
    print("pallas == xla on hardware:", ok)


if __name__ == "__main__" and "--chain" in sys.argv:
    dependency_chain()


def split_wrapper_kernel():
    """Where do the 4.5ms go? Time (a) wrapper prep only (qreg/rbuf
    build in XLA), (b) full call, both under dependency chains."""
    B, Lq, Lt = 512, 128, 1024
    rng = np.random.default_rng(0)
    params = SWParams(1, -4, 7, 1)
    cells = B * Lq * Lt
    q = jax.device_put(rng.integers(0, 4, (B, Lq)).astype(np.int8))
    t = jax.device_put(rng.integers(0, 4, (B, Lt)).astype(np.int8))
    ql = jax.device_put(np.full(B, Lq, np.int32))
    tl = jax.device_put(np.full(B, Lt, np.int32))

    def _round_up(x, m):
        return (x + m - 1) // m * m

    S = _round_up(Lq + 1, 8)
    steps = Lq + Lt - 1
    n_chunks = -(-steps // S)

    def prep(q, t):
        q32 = q.astype(jnp.int32)
        t32 = t.astype(jnp.int32)
        qreg = jnp.full((S, B), 127, jnp.int32).at[1:Lq + 1, :].set(q32.T)
        cidx = jnp.arange(n_chunks, dtype=jnp.int32)[:, None]
        uidx = jnp.arange(2 * S, dtype=jnp.int32)[None, :]
        tpos = (cidx + 1) * S - uidx
        okpos = (tpos >= 0) & (tpos < Lt)
        tp = jnp.where(okpos, tpos, 0)
        rbuf = jnp.where(okpos[..., None],
                         jnp.take(t32, tp, axis=1).transpose(1, 2, 0), 127)
        return qreg, rbuf

    @jax.jit
    def chained_prep(q, t):
        s = jnp.zeros((), jnp.int32)
        for _ in range(8):
            qreg, rbuf = prep((q + jnp.where(s < 0, 1, 0).astype(jnp.int8)),
                              (t + jnp.where(s < 0, 1, 0).astype(jnp.int8)))
            s = s + qreg.sum() + rbuf.sum()
        return s
    jax.block_until_ready(chained_prep(q, t))
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(chained_prep(q, t))
        print(f"prep only: {(time.time()-t0)/8*1e3:.3f} ms/batch")


if __name__ == "__main__" and "--split" in sys.argv:
    split_wrapper_kernel()


def tb_sweep():
    B, Lq, Lt = 512, 128, 1024
    rng = np.random.default_rng(0)
    params = SWParams(1, -4, 7, 1)
    cells = B * Lq * Lt
    q = jax.device_put(rng.integers(0, 4, (B, Lq)).astype(np.int8))
    t = jax.device_put(rng.integers(0, 4, (B, Lt)).astype(np.int8))
    ql = jax.device_put(np.full(B, Lq, np.int32))
    tl = jax.device_put(np.full(B, Lt, np.int32))
    from gappadder_tpu.ops import sw_xla
    s2, q2, t2 = sw_xla.sw_batch(q, ql, t, tl, params, "local")
    import os as _os
    tbs = [int(x) for x in _os.environ.get("TBS", "128,256,512").split(",")]
    for tb in tbs:
        @jax.jit
        def chained(q, t, tb=tb):
            s = jnp.zeros((), jnp.int32)
            for _ in range(8):
                w = jnp.where(s < 0, 1, 0).astype(jnp.int8)
                sc, qe, te = sw_pallas.sw_batch_pallas(
                    q + w, ql, t, tl, params, "local", batch_tile=tb)
                s = s + sc.sum()
            return s
        try:
            jax.block_until_ready(chained(q, t))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(chained(q, t))
                best = min(best, (time.time() - t0) / 8)
            s1, q1, t1 = sw_pallas.sw_batch_pallas(
                q, ql, t, tl, params, "local", batch_tile=tb)
            ok = (np.array_equal(np.asarray(s1), np.asarray(s2)) and
                  np.array_equal(np.asarray(q1), np.asarray(q2)) and
                  np.array_equal(np.asarray(t1), np.asarray(t2)))
            print(f"TB={tb}: {best*1e3:.3f} ms/batch = "
                  f"{cells/best/1e9:.1f} GCUPS  correct={ok}")
        except Exception as e:
            print(f"TB={tb}: FAIL {str(e)[:200]}")


if __name__ == "__main__" and "--tb" in sys.argv:
    tb_sweep()


def slope(tb=128):
    """Canonical honest timing: K-chained kernels in one jit, fetch-
    forced, slope over K. block_until_ready is NOT reliable on axon."""
    B, Lq, Lt = 512, 128, 1024
    rng = np.random.default_rng(0)
    params = SWParams(1, -4, 7, 1)
    cells = B * Lq * Lt
    q = jax.device_put(rng.integers(0, 4, (B, Lq)).astype(np.int8))
    t = jax.device_put(rng.integers(0, 4, (B, Lt)).astype(np.int8))
    ql = jax.device_put(np.full(B, Lq, np.int32))
    tl = jax.device_put(np.full(B, Lt, np.int32))

    def mk(K):
        @jax.jit
        def chained(q, t):
            s = jnp.zeros((), jnp.int32)
            for _ in range(K):
                w = jnp.where(s < 0, 1, 0).astype(jnp.int8)
                sc, qe, te = sw_pallas.sw_batch_pallas(
                    q + w, ql, t, tl, params, "local", batch_tile=tb)
                s = s + sc.sum()
            return s
        return chained
    times = {}
    for K in (1, 65):
        fn = mk(K)
        np.asarray(fn(q, t))
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            np.asarray(fn(q, t))
            best = min(best, time.time() - t0)
        times[K] = best
    per = (times[65] - times[1]) / 64
    print(f"SLOPE TB={tb}: {per*1e3:.3f} ms/batch = "
          f"{cells/per/1e9:.1f} GCUPS (intercept {times[1]*1e3:.1f} ms)")
    return per


if __name__ == "__main__" and "--slope" in sys.argv:
    import os as _os
    slope(int(_os.environ.get("TB", "128")))
