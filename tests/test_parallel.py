"""Driver entry points compile and run on the virtual CPU mesh.

The flagship step is the fused pipeline slice (parallel/slice.py);
its mesh-shape invariance and multi-process equality are covered by
test_slice.py / test_multiprocess.py. Here: the __graft_entry__
surface the driver actually calls.
"""

import jax


def test_dryrun_entrypoints():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8,)     # counts3 + 5 capacity indicators
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)
