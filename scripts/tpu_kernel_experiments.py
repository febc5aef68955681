"""Micro-experiments for SW kernel v3 design decisions (run on TPU).

1. Does Mosaic allow dynamic SUBLANE slicing of a VMEM ref?
2. int16 state arithmetic lowering.
3. Rough cost of per-step cross-sublane argmax vs elementwise best.
"""

import sys
import time

sys.path.insert(0, ".")

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def exp_dynamic_sublane():
    def kern(idx_ref, t_ref, o_ref):
        j = idx_ref[0, 0]
        row = t_ref[pl.ds(j, 1), :]          # dynamic sublane slice
        o_ref[:] = row

    t = np.arange(64 * 128, dtype=np.int32).reshape(64, 128)
    idx = np.array([[17]], np.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, t)
    ok = np.array_equal(np.asarray(out)[0], t[17])
    print("dynamic sublane slice:", "OK" if ok else "WRONG", flush=True)


def exp_int16_loop():
    S, TB, steps = 128, 128, 1024

    def kern(x_ref, o_ref):
        x = x_ref[:].astype(jnp.int16)

        def body(i, c):
            h, e = c
            e = jnp.maximum(h - jnp.int16(1), e - jnp.int16(1))
            h2 = pltpu.roll(h, 1, 0)
            h = jnp.maximum(h2 + jnp.int16(1), e)
            h = jnp.maximum(h, jnp.int16(-16384))
            return (h, e)

        h, e = jax.lax.fori_loop(0, steps, body, (x, x))
        o_ref[:] = h.astype(jnp.int32)

    x = np.zeros((S, TB), np.int32)
    t0 = time.time()
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, TB), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    jax.block_until_ready(out)
    print(f"int16 loop compile+run: {time.time()-t0:.1f}s", flush=True)

    # timed
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, TB), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(50):
        o = f(x)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / 50
    print(f"int16 5-op loop: {dt*1e6:.0f} us for {steps} steps "
          f"({dt/steps*1e9:.0f} ns/step)", flush=True)


def exp_int32_loop_with_argmax():
    S, TB, steps = 128, 128, 1024

    def kern(x_ref, o_ref):
        x = x_ref[:]

        def body(i, c):
            h, e, bs = c
            e = jnp.maximum(h - 1, e - 1)
            h = jnp.maximum(pltpu.roll(h, 1, 0) + 1, e)
            m = jnp.max(h, axis=0, keepdims=True)
            am = jnp.argmax(h.astype(jnp.float32), axis=0).astype(jnp.int32)[None]
            bs = jnp.maximum(bs, m + am * 0)
            return (h, e, bs)

        h, e, bs = jax.lax.fori_loop(0, steps, body,
                                     (x, x, x[0:1] * 0))
        o_ref[:] = h + bs

    x = np.zeros((S, TB), np.int32)
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, TB), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(50):
        o = f(x)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / 50
    print(f"int32 4-op + argmax loop: {dt*1e6:.0f} us "
          f"({dt/steps*1e9:.0f} ns/step)", flush=True)


if __name__ == "__main__":
    for name, fn in [("dyn", exp_dynamic_sublane),
                     ("i16", exp_int16_loop),
                     ("i32argmax", exp_int32_loop_with_argmax)]:
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
