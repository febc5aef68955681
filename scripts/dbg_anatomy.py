"""Per-phase slope timing INSIDE the DBG lane core at production shape
(one (k, sub_k)=(30,27) setting, 16 gaps, M=2048, ncap=8192).

Phases (nested prefixes): occ (edge-occurrence extract) | unique
(occurrence unique-compact) | endpoint (u/v sort + rank + node_keys /
ids scatters) | chains (degrees + pointer doubling) | emit (full).

Usage: python scripts/dbg_anatomy.py [--cpu]
"""

import functools
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from gappadder_tpu import dna
    from gappadder_tpu.ops import dbg, kmers, psort

    G, M, k, sub_k, ncap = 16, 2048, 30, 27, 8192
    rng = np.random.default_rng(0)
    arr = np.full((G, M, k), dna.N, np.int8)
    nk = np.zeros(G, np.int32)
    for g in range(G):
        region = rng.integers(0, 4, 1184).astype(np.int8)
        seen = {}
        for i in range(len(region) - k + 1):
            s = bytes(region[i:i + k])
            rc = bytes(dna.revcomp(region[i:i + k]))
            seen.setdefault(min(s, rc), None)
        rows = list(seen)[:M]
        for j, r in enumerate(rows):
            arr[g, j] = np.frombuffer(r, np.int8)
        nk[g] = len(rows)
    kstr = jnp.asarray(arr)
    nkj = jnp.asarray(nk)

    def lane(occ_keys, sub_k_t, upto):
        edge_keys, n_edges = dbg._unique_compact(occ_keys[None])
        edge_keys, n_edges = edge_keys[0], n_edges[0]
        if upto == "unique":
            return jnp.sum(n_edges) + jnp.sum(edge_keys[:, 0])
        edge_keys = edge_keys[:ncap]
        n_edges = jnp.minimum(n_edges, ncap)
        E = ncap
        edge_valid = jnp.arange(E) < n_edges
        u_keys = dbg._prefix_kmer_dyn(edge_keys, sub_k_t)
        v_keys = dbg._suffix_kmer_dyn(edge_keys, sub_k_t)
        nl = u_keys.shape[-1]
        q = jnp.concatenate([u_keys, v_keys], axis=0)
        pay = jnp.arange(2 * E, dtype=jnp.int32)
        ops = tuple(q[:, l] for l in range(nl)) + (pay,)
        res = psort.bitonic_sort(ops, num_keys=nl)
        sq = jnp.stack(res[:nl], axis=-1)
        spay = res[nl]
        vrow = ~jnp.all(sq == dbg.FULL, axis=-1)
        firsts = kmers.unique_mask(sq) & vrow
        rank = jnp.cumsum(firsts.astype(jnp.int32)) - 1
        N = ncap
        n_nodes = jnp.minimum(jnp.sum(firsts), N)
        node_valid = jnp.arange(N) < n_nodes
        rank_c = jnp.clip(rank, 0, N - 1)
        node_keys = jnp.full((N + 1, nl), dbg.FULL, jnp.uint32).at[
            jnp.where(firsts & (rank < N), rank_c, N)].set(
            sq, mode="drop")[:N]
        ids = jnp.zeros(2 * E, jnp.int32).at[spay].set(rank_c)
        u_id_raw, v_id_raw = ids[:E], ids[E:]
        if upto == "endpoint":
            return (jnp.sum(node_keys[:, 0]) + jnp.sum(u_id_raw)
                    + jnp.sum(v_id_raw))
        if upto == "degrees":
            u_id = jnp.where(edge_valid, u_id_raw, N)
            v_id = jnp.where(edge_valid, v_id_raw, N)
            outdeg = jnp.zeros(N + 1, jnp.int32).at[u_id].add(
                1, mode="drop")
            indeg = jnp.zeros(N + 1, jnp.int32).at[v_id].add(
                1, mode="drop")
            chain = edge_valid & (outdeg[u_id] == 1) & (indeg[v_id] == 1)
            prev = jnp.arange(N + 1, dtype=jnp.int32)
            prev = prev.at[jnp.where(chain, v_id, N)].set(
                jnp.where(chain, u_id, N), mode="drop")
            return jnp.sum(prev) + jnp.sum(outdeg) + jnp.sum(indeg)
        g = dbg._graph_chains(u_id_raw, v_id_raw, edge_valid, node_valid,
                              N, sub_k_t)
        if upto == "chains":
            return (jnp.sum(g["off"]) + jnp.sum(g["rep"])
                    + jnp.sum(g["ulen_all"]))
        # tip-clip + winner selection (the first half of emission)
        outdeg, indeg = g["outdeg"], g["indeg"]
        u_id, v_id = g["u_id"], g["v_id"]
        new_head, ulen_all, tail_of = (g["new_head"], g["ulen_all"],
                                       g["tail_of"])
        head_dead = indeg[:N] == 0
        tailc = jnp.clip(tail_of, 0, N - 1)
        tail_dead = jnp.where(tail_of >= 0, outdeg[tailc] == 0, True)
        pred_branch = jnp.zeros(N + 1, jnp.int32).at[v_id].max(
            outdeg[u_id], mode="drop")[:N] >= 2
        succ_branch = jnp.zeros(N + 1, jnp.int32).at[u_id].max(
            indeg[v_id], mode="drop")[:N] >= 2
        tip_a = (head_dead & ~tail_dead & succ_branch[tailc]
                 & (tail_of >= 0))
        tip_b = ~head_dead & tail_dead & pred_branch
        is_tip = (new_head & (tip_a | tip_b)
                  & (ulen_all < 2 * (sub_k_t + 1)))
        eligible = new_head & (ulen_all >= 40) & ~is_tip
        sort_key = jnp.where(eligible, -ulen_all, 1)
        order = jnp.argsort(sort_key, stable=True)
        if upto == "tips":
            return jnp.sum(order[:4]) + jnp.sum(is_tip)
        return None

    def prep(w):
        row_valid = jnp.arange(M)[None, :] < (nkj + w)[:, None]
        fwd = jnp.where(row_valid[..., None], kstr, dna.N)
        rcs = dna.revcomp_jnp(fwd)
        both = jnp.concatenate([fwd, rcs], axis=1)
        blen = jnp.where(jnp.concatenate([row_valid, row_valid], axis=1),
                         k, 0)
        elimb, _ = kmers.extract_kmers(both, blen, sub_k + 1)
        return elimb.reshape(G, -1, elimb.shape[-1])

    def make(upto):
        if upto == "occ":
            def fn(w):
                return jnp.sum(prep(w)[..., 0].astype(jnp.uint32))
            return fn

        def fn(w):
            occ = prep(w)
            out = jax.vmap(lambda o: lane(o, jnp.int32(sub_k), upto))(occ)
            return jnp.sum(out)
        return fn

    def make_full(w):
        return None

    def slope(fn, k_lo=1, k_hi=3, repeats=7):
        def chain(K):
            @jax.jit
            def c(x):
                s = x.astype(jnp.uint32)
                for _ in range(K):
                    w = jnp.where(s > jnp.uint32(1 << 31), 1, 0
                                  ).astype(jnp.int32)
                    s = s + fn(w).astype(jnp.uint32)
                return s
            return c
        times = {}
        for K in (k_lo, k_hi):
            f = chain(K)
            np.asarray(f(jnp.uint32(0)))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                np.asarray(f(jnp.uint32(0)))
                best = min(best, time.time() - t0)
            times[K] = best
        return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)

    # full = the real assemble_unitigs call
    def full_fn(w):
        us, ul, uc, nn, ne = dbg.assemble_unitigs(
            kstr, nkj + w, None, k=k, sub_k=sub_k, max_unitigs=4,
            max_len=2048, min_len=40, node_cap=ncap, edge_cap=ncap)
        return jnp.sum(ul).astype(jnp.uint32)

    prev = 0.0
    out = {}
    for upto in ("occ", "unique", "endpoint", "degrees", "chains",
                 "tips", "full"):
        fn = full_fn if upto == "full" else make(upto)
        t = slope(fn)
        out[upto + "_ms"] = round(t * 1e3, 2)
        out[upto + "_delta_ms"] = round((t - prev) * 1e3, 2)
        prev = t
    import jax as _j
    out["backend"] = _j.default_backend()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
