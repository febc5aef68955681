"""Isolate what bounds the SW kernel: per-step loop overhead vs
vector op throughput vs VMEM state traffic.

Runs stripped variants of the wavefront loop shape (S=136 sublanes x
TB=128 lanes, 1151 steps, 4 batch tiles) and times each under a
dependency chain:
  ops0   roll rbuf only
  ops1   roll rbuf + 5 elementwise ops on 1 carried array
  ops3   roll rbuf + ~15 ops on 3 carried arrays
  full   roll rbuf + ~30 ops on 5 carried arrays (SW-like)
"""
import sys
import time
import functools

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


S, TB, NBT, NSTEP = 136, 128, 4, 1152


def make_kernel(level):
    def kern(x_ref, o_ref, a_s, b_s, c_s, d_s, e_s, rb_s):
        @pl.when(pl.program_id(1) == 0)
        def _():
            x = x_ref[:]
            a_s[:] = x
            b_s[:] = x + 1
            c_s[:] = x + 2
            d_s[:] = x + 3
            e_s[:] = x + 4
            rb_s[:] = jnp.concatenate([x, x], axis=0)

        A, Bv, C, D, E = a_s[:], b_s[:], c_s[:], d_s[:], e_s[:]
        rb = rb_s[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (S, TB), 0)
        rowm0 = row == 0

        def body(s, carry):
            A, Bv, C, D, E, rb = carry
            rb = pltpu.roll(rb, 1, 0)
            tr = jax.lax.slice_in_dim(rb, S, 2 * S, axis=0)
            if level >= 1:
                A = jnp.maximum(A - 1, tr)
                A = jnp.where(rowm0, tr, A)
                A = A + (s - s)
            if level >= 2:
                Bv = jnp.maximum(Bv - 2, A - 7)
                C = jnp.where(rowm0, A, pltpu.roll(C, 1, 0))
                C = jnp.maximum(C, Bv)
                A = jnp.where(C > A, C, A)
            if level >= 3:
                D = jnp.maximum(jnp.where(rowm0, A, pltpu.roll(D, 1, 0)),
                                C - 1)
                E = jnp.where(D > E, D, E)
                sc = jnp.where(tr == A, 1, -4)
                A = jnp.maximum(A + sc, D)
                Bv = jnp.where((row >= 1) & (row <= s), Bv, E)
                C = jnp.maximum(C, 0)
                E = jnp.where(rowm0, C, pltpu.roll(E, 1, 0))
            return (A, Bv, C, D, E, rb)

        A, Bv, C, D, E, rb = jax.lax.fori_loop(
            0, NSTEP // 8, body, (A, Bv, C, D, E, rb))
        a_s[:], b_s[:], c_s[:], d_s[:], e_s[:] = A, Bv, C, D, E
        rb_s[:] = rb

        @pl.when(pl.program_id(1) == 7)
        def _():
            o_ref[:] = jnp.max(A + Bv + C + D + E, axis=0, keepdims=True)
    return kern


@functools.partial(jax.jit, static_argnames=("level",))
def run(x, level):
    kern = make_kernel(level)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, NBT * TB), jnp.int32),
        grid=(NBT, 8),
        in_specs=[pl.BlockSpec((S, TB), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TB), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, TB), jnp.int32)] * 5 +
                       [pltpu.VMEM((2 * S, TB), jnp.int32)],
    )(x)


def main():
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 100, (S, NBT * TB)).astype(np.int32))
    for level in (0, 1, 2, 3):
        @jax.jit
        def chained(x, level=level):
            s = jnp.zeros((), jnp.int32)
            for _ in range(8):
                o = run(x + jnp.where(s < 0, 1, 0), level)
                s = s + o.sum()
            return s
        jax.block_until_ready(chained(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(chained(x))
            best = min(best, (time.time() - t0) / 8)
        print(f"level {level}: {best*1e3:.3f} ms "
              f"({best/NSTEP/NBT*1e9:.0f} ns/tile-step)")


if __name__ == "__main__":
    main()


def verify():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 100, (S, NBT * TB)).astype(np.int32)
    kern = make_kernel(3)
    call = lambda interp: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, NBT * TB), jnp.int32),
        grid=(NBT, 8),
        in_specs=[pl.BlockSpec((S, TB), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TB), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, TB), jnp.int32)] * 5 +
                       [pltpu.VMEM((2 * S, TB), jnp.int32)],
        interpret=interp,
    )(x)
    got = np.asarray(call(False))
    want = np.asarray(call(True))
    print("probe level3 correct:", np.array_equal(got, want),
          got[0, :4], want[0, :4])


if "--verify" in sys.argv:
    verify()


def fetch_time():
    """np.asarray readback cannot lie: times probe level3 and scaling
    in NSTEP to separate tunnel latency from device compute."""
    rng = np.random.default_rng(0)
    xs = [jax.device_put(rng.integers(0, 100, (S, NBT * TB))
                         .astype(np.int32)) for _ in range(4)]
    for level in (0, 3):
        o = run(xs[0], level)
        np.asarray(o)
        best = float("inf")
        for i in range(4):
            t0 = time.time()
            np.asarray(run(xs[i], level))
            best = min(best, time.time() - t0)
        print(f"fetch level {level}: {best*1e3:.3f} ms "
              f"({best/NSTEP/NBT*1e9:.1f} ns/tile-step)")


if "--fetch" in sys.argv:
    fetch_time()


def slope_time():
    """Fetch-forced slope timing: time(K chained kernels) vs K.
    Slope = true per-kernel device time, intercept = tunnel latency."""
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 100, (S, NBT * TB))
                       .astype(np.int32))

    def mk(K, level):
        @jax.jit
        def chained(x):
            s = jnp.zeros((), jnp.int32)
            for _ in range(K):
                o = run(x + jnp.where(s < 0, 1, 0), level)
                s = s + o.sum()
            return s
        return chained
    for level in (0, 3):
        times = {}
        for K in (1, 9):
            fn = mk(K, level)
            np.asarray(fn(x))
            best = float("inf")
            for _ in range(4):
                t0 = time.time()
                np.asarray(fn(x))
                best = min(best, time.time() - t0)
            times[K] = best
        per = (times[9] - times[1]) / 8
        print(f"slope level {level}: {per*1e3:.3f} ms/kernel "
              f"({per/NSTEP/NBT*1e9:.1f} ns/tile-step), "
              f"intercept~{times[1]*1e3:.1f} ms")


if "--slope" in sys.argv:
    slope_time()
