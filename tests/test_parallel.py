"""Sharded step: multi-device mesh correctness on the virtual CPU mesh."""

import numpy as np
import jax

from gappadder_tpu.parallel import mesh as pmesh
from gappadder_tpu.parallel import step as pstep


def test_dryrun_entrypoints():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (2,)
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)


def test_sharded_matches_single_device():
    n = 8
    mesh = pmesh.make_mesh(devices=jax.devices()[:n])
    fn = pstep.make_sharded_step(mesh)
    args = pstep.example_inputs(n)
    placed = pstep.place_inputs(mesh, args)
    counts, hist, score, qe, te = jax.block_until_ready(fn(*placed))

    # unsharded single-shard run over the SAME data: psums reduce to
    # plain sums, so totals must match
    import functools
    single = functools.partial(pstep._local_step, k=21, axes=())
    c1, h1, s1, q1, t1 = jax.jit(single)(*args)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(hist), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(score), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(qe), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(te), np.asarray(t1))
