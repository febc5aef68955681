"""The sharded gap-closing step: one fused device program combining
the pipeline's hot kernels under real multi-chip shardings.

Shardings (SURVEY.md §2c mapping):
  reads, alignment records   -> sharded along 'dp' (batch axis)
  flank->contig SW pairs     -> sharded along 'dp'
  all-pairs overlap tiles    -> sharded along 'sp'
  gap window table, flanks   -> replicated
  k-mer histogram            -> psum over ('dp','sp')
  per-shard clip counts      -> psum

This is both the dryrun_multichip target (compiled over an N-device
mesh) and the shape of the production inner loop: classify -> count ->
align, one jit, collectives over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import kmers, sw_xla
from ..ops.classify import classify_reads
from ..ops.sw_host import SWParams

HIST_BUCKETS = 1024


def _local_step(tid, pos, flag, mapq, mtid, mpos, tlen, lclip, rclip,
                reads, rlen,
                q, qlen, t, tl,
                wtid, wstart, wend, wgap, wedge, gstart, gend,
                *, k: int, axes):
    """Per-shard compute; collectives across `axes`."""
    out = classify_reads(tid, pos, flag, mapq, mtid, mpos, tlen,
                         lclip, rclip, wtid, wstart, wend, wgap, wedge,
                         gstart, gend, dist1=210, dist2=390, clip_dist=250,
                         anchor_mapq=30, short_insert=True, fanout=4)
    clip_count = jnp.sum(out["clip"]).astype(jnp.int32)
    disc_count = jnp.sum(out["disc"]).astype(jnp.int32)
    counts = jax.lax.psum(jnp.stack([clip_count, disc_count]), axes)

    limbs, valid = kmers.extract_kmers(reads, rlen, k)
    h = (limbs[..., 0] >> 16) % HIST_BUCKETS
    hist = jnp.zeros((HIST_BUCKETS,), jnp.int32).at[
        jnp.where(valid, h, 0).reshape(-1)].add(
        valid.reshape(-1).astype(jnp.int32))
    hist = jax.lax.psum(hist, axes)

    score, qe, te = sw_xla.sw_batch(q, qlen, t, tl, SWParams(), "local")
    return counts, hist, score, qe, te


def make_sharded_step(mesh, k: int = 21):
    """Build the jitted multi-chip step for the given mesh."""
    axes = tuple(mesh.axis_names)
    dp = P(axes)          # flatten all mesh axes onto the batch dim
    rep = P()

    fn = functools.partial(_local_step, k=k, axes=axes)
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(dp,) * 9 + (dp, dp) + (dp,) * 4 + (rep,) * 7,
        out_specs=(rep, rep, dp, dp, dp),
        # scan carries in the SW kernel start from replicated constants;
        # skip the varying-manual-axes consistency inference
        check_vma=False,
    )
    return jax.jit(sharded)


def example_inputs(n_shards: int, reads_per_shard: int = 64,
                   read_len: int = 32, pairs_per_shard: int = 8,
                   lq: int = 32, lt: int = 48, n_windows: int = 8,
                   seed: int = 0):
    """Tiny correctly-sharded example batch (for dryrun/compile checks)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    N = n_shards * reads_per_shard
    B = n_shards * pairs_per_shard
    i32 = lambda x: np.asarray(x, np.int32)
    recs = dict(
        tid=i32(rng.integers(0, 2, N)), pos=i32(rng.integers(0, 2000, N)),
        flag=i32(rng.choice([0x41, 0x81, 0x45, 0x49], N)),
        mapq=i32(rng.choice([0, 30, 60], N)),
        mtid=i32(rng.integers(0, 2, N)),
        mpos=i32(rng.integers(0, 2000, N)),
        tlen=i32(rng.choice([150, 900, -900], N)),
        lclip=i32(rng.choice([0, 10], N)), rclip=i32(rng.choice([0, 10], N)))
    reads = rng.integers(0, 4, (N, read_len)).astype(np.int8)
    rlen = np.full(N, read_len, np.int32)
    q = rng.integers(0, 4, (B, lq)).astype(np.int8)
    qlen = np.full(B, lq, np.int32)
    t = rng.integers(0, 4, (B, lt)).astype(np.int8)
    tl = np.full(B, lt, np.int32)
    gstart = i32(np.sort(rng.integers(100, 1900, n_windows // 2)))
    gend = gstart + 50
    wtid = i32(np.zeros(n_windows))
    wstart = i32(np.sort(rng.integers(0, 1900, n_windows)))
    wend = wstart + 400
    wgap = i32(rng.integers(0, n_windows // 2, n_windows))
    wedge = i32(rng.integers(0, 2, n_windows))
    return (recs["tid"], recs["pos"], recs["flag"], recs["mapq"],
            recs["mtid"], recs["mpos"], recs["tlen"], recs["lclip"],
            recs["rclip"], reads, rlen, q, qlen, t, tl,
            wtid, wstart, wend, wgap, wedge, gstart, gend)


def place_inputs(mesh, args):
    """Device_put each arg with its step sharding."""
    axes = tuple(mesh.axis_names)
    dp = NamedSharding(mesh, P(axes))
    rep = NamedSharding(mesh, P())
    specs = [dp] * 15 + [rep] * 7
    return tuple(jax.device_put(a, s) for a, s in zip(args, specs))
