"""Mosaic int16 lowering blocker — minimal repro (round-4 status).

The SW wavefront kernel (ops/sw_pallas.py) is VPU-issue-bound on int32
vectors; native int16 would double per-instruction element throughput
(the 300+ GCUPS rung of the kernel ladder). This script is the
committed evidence that int16 STILL does not lower through Mosaic on
this toolchain: both a minimal elementwise kernel and a pltpu.roll
kernel on int16 crash the remote TPU compile helper (HTTP 500,
tpu_compile_helper subprocess exit code 1; re-probed 2026-08-21 on the
v5e tunnel — same result as rounds 2 and 3).

Why not SWAR (two int16 pairs packed per int32 lane) instead: the DP
inner loop is dominated by jnp.maximum, and a packed-pair maximum is
not expressible as an int32 maximum (per-half compare needs masks +
shifts that cost more than the 2x lane win); additive carries across
the half boundary would additionally need per-step bias re-centering.
Counted on the v4 kernel body: SWAR raises the per-step op count by
~1.7x for a 2x lane gain — a ~15% ceiling at best, not worth the
correctness risk. Native int16 remains the real unlock.

Run: python scripts/mosaic_int16_repro.py  (prints OK/FAILED per case)
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, kern, dtype=jnp.int16):
    x = np.arange(32 * 128, dtype=np.int16).reshape(32, 128)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((32, 128), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(x))
        print(f"{name}: OK {np.asarray(out)[0, :4]}")
        return True
    except Exception as e:  # noqa: BLE001 — the repro IS the exception
        print(f"{name}: FAILED: {str(e)[:200]}")
        return False


def main():
    def elementwise(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = jnp.maximum(x + jnp.int16(3), x - jnp.int16(2))

    def roll(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 1, 0)

    ok1 = probe("int16 elementwise (add/sub/max)", elementwise)
    ok2 = probe("int16 pltpu.roll", roll)
    if ok1 and ok2:
        print("int16 NOW LOWERS — revisit the SW kernel's dtype "
              "(docs/kernel-notes.md, 300+ GCUPS rung)")


if __name__ == "__main__":
    main()
