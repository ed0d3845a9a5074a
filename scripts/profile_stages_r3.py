#!/usr/bin/env python3
"""Stage-level timings of the production round at bench shapes (round 3).

Fence-based: each stage is one jitted dispatch timed by a device_get fence.
RTT (~34 ms) is measured and reported so stage costs can be read net of it.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mhm2_proxy_tpu.ops import count as C
    from mhm2_proxy_tpu.ops.lookup import table_join_payload
    from mhm2_proxy_tpu.ops.pallas_extract import extract_packed_lanes
    from mhm2_proxy_tpu.dbjg.traverse import build_edges

    k = 21
    B, L = 131072, 160
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 8_000_000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = jnp.asarray(np.stack([genome[s : s + L] for s in starts]))
    qual_ok = jnp.asarray(rng.random((B, L)) > 0.02)
    lens = jnp.asarray(np.full((B,), L, np.int32))
    print(f"platform={jax.devices()[0].platform} B={B} L={L} k={k}", flush=True)

    def fence(tree):
        leaves = [x[(0,) * x.ndim] for x in jax.tree.leaves(tree) if hasattr(x, "ndim")]
        jax.device_get(leaves)

    def timed(name, f, *args, reps=3):
        fence(f(*args))  # compile + warm
        tmin = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(f(*args))
            tmin = min(tmin, time.perf_counter() - t0)
        print(f"{name:40s} {tmin*1e3:9.1f} ms", flush=True)
        return tmin

    # RTT floor
    tiny = jnp.zeros((8,), jnp.uint32)
    timed("RTT floor (identity fence)", jax.jit(lambda x: x + 1), tiny)

    timed("extract_packed_lanes", jax.jit(
        lambda c, q, l: extract_packed_lanes(c, q, l, k)), codes, qual_ok, lens)

    lanes = extract_packed_lanes(codes, qual_ok, lens, k)
    flat = tuple(x.reshape(-1) for x in lanes)
    N = flat[0].shape[0]
    weff = len(flat)
    print(f"record rows N={N} weff={weff}", flush=True)

    sortfn = jax.jit(lambda a: jax.lax.sort(a, num_keys=weff, is_stable=False))
    timed("record sort (lax.sort, packed lanes)", sortfn, flat)
    sorted_lanes = sortfn(flat)

    from mhm2_proxy_tpu.ops.pallas_scan import TILE as SCAN_TILE, group_sums_scan_packed

    free = 32 * weff - 2 * k
    keymask_int = 0xFFFFFFFF ^ ((1 << free) - 1)
    Np = -(-N // SCAN_TILE) * SCAN_TILE
    lanes_p = tuple(
        jnp.concatenate([x, jnp.full((Np - N,), 0xFFFFFFFF, jnp.uint32)])
        for x in sorted_lanes
    )
    timed("group_sums_scan_packed", jax.jit(
        lambda a: group_sums_scan_packed(a, keymask_int, 10000)), lanes_p)

    timed("aggregate_split_packed (sort+scan+split)", jax.jit(
        lambda a: C.aggregate_split_packed(a, k, 2)), flat)

    # --- edges at table scale (8.4M rows, the bench table's trim class) ---
    T = 1 << 23
    keys = np.sort(rng.integers(0, 1 << 42, T, dtype=np.uint64))
    twords = jnp.asarray(
        np.stack([(keys >> 10).astype(np.uint32),
                  ((keys & 0x3FF) << 22).astype(np.uint32)], axis=-1)
    )
    tcnt = jnp.asarray(rng.integers(2, 100, T, dtype=np.int32))
    tleft = jnp.asarray(rng.integers(0, 4, T, dtype=np.uint8))
    tright = jnp.asarray(rng.integers(0, 4, T, dtype=np.uint8))
    tn = jnp.int32(T - 1000)

    timed(f"build_edges (T={T})", jax.jit(
        lambda w: build_edges(w, tcnt, tleft, tright, tn, k)), twords)

    q = jnp.concatenate([twords, twords])
    ext_pay = tleft.astype(jnp.uint32) | (tright.astype(jnp.uint32) << jnp.uint32(3))
    from mhm2_proxy_tpu.ops import lookup as LK

    LK._USE_MERGE_JOIN = False
    timed("join OLD (concat sort, T+2T rows)", jax.jit(
        lambda qq: table_join_payload(twords, tn, qq, ext_pay, payload_bits=6)), q)
    LK._USE_MERGE_JOIN = True
    timed("join NEW (query sort + merge)", jax.jit(
        lambda qq: table_join_payload(twords, tn, qq, ext_pay, payload_bits=6)), q)
    LK._USE_MERGE_JOIN = None

    # sort variants on the record lanes
    timed("record sort num_keys=1 (lane0 only)", jax.jit(
        lambda a: jax.lax.sort(a, num_keys=1, is_stable=False)), flat)
    both = tuple(jnp.concatenate([x, x ^ jnp.uint32(0x55555550)]) for x in flat)
    timed(f"record sort 2N rows (N={2*N})", jax.jit(
        lambda a: jax.lax.sort(a, num_keys=weff, is_stable=False)), both)

    # pallas merge throughput at join scale (3 lanes)
    from mhm2_proxy_tpu.ops.pallas_sort import merge_sorted_lanes

    M = 1 << 23
    a_lanes = (jnp.sort(jnp.asarray(rng.integers(0, 1 << 32, M, dtype=np.uint64).astype(np.uint32))),)
    a_lanes = a_lanes + (jnp.zeros((M,), jnp.uint32), jnp.zeros((M,), jnp.uint32))
    b_lanes = (jnp.sort(jnp.asarray(rng.integers(0, 1 << 32, M, dtype=np.uint64).astype(np.uint32))),)
    b_lanes = b_lanes + (jnp.zeros((M,), jnp.uint32), jnp.zeros((M,), jnp.uint32))
    timed(f"pallas merge 2x{M} rows 3 lanes", jax.jit(
        lambda a, b: merge_sorted_lanes(a, b, kw=1)), a_lanes, b_lanes)


if __name__ == "__main__":
    main()
