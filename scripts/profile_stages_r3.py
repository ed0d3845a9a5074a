#!/usr/bin/env python3
"""Stage-level timings of the production round at bench shapes (round 3).

Chained-jit differencing per stage: each stage runs `iters` times inside one
jit with data-dependent perturbation between iterations, and two chain
lengths are differenced to cancel dispatch/RTT/compile-cache constants.
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
    from mhm2_proxy_tpu.ops.pallas_extract import extract_packed_lanes
    from mhm2_proxy_tpu.dbjg.traverse import build_edges
    from mhm2_proxy_tpu.constants import minimizer_len_for_k

    k = 21
    m = minimizer_len_for_k(k)
    B, L = 131072, 160
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 8_000_000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = jnp.asarray(np.stack([genome[s : s + L] for s in starts]))
    qual_ok = jnp.asarray(rng.random((B, L)) > 0.02)
    lens = jnp.asarray(np.full((B,), L, np.int32))
    print(f"platform={jax.devices()[0].platform} B={B} L={L} k={k}", flush=True)

    def timed_chain(name, fn, arg, lo=2, hi=6, reps=2):
        """fn: (arg, i) -> (next_arg, sink). Prints per-iteration seconds."""

        def chain(iters):
            @jax.jit
            def many(a):
                def body(i, carry):
                    a, acc = carry
                    a2, sink = fn(a, i)
                    return a2, acc + sink.astype(jnp.uint32)

                return jax.lax.fori_loop(0, iters, body, (a, jnp.uint32(0)))[1]

            return many

        ts = {}
        for iters in (lo, hi):
            f = chain(iters)
            np.asarray(f(arg))  # compile+warm
            tmin = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(f(arg))
                tmin = min(tmin, time.perf_counter() - t0)
            ts[iters] = tmin
        per = (ts[hi] - ts[lo]) / (hi - lo)
        print(f"{name:34s} {per*1e3:9.2f} ms/iter", flush=True)
        return per

    # --- stage 1: extraction (codes -> packed lanes) ---
    def f_extract(a, i):
        lanes = extract_packed_lanes(a, qual_ok, lens, k)
        bump = (lanes[0][0, 0] & jnp.uint32(3)).astype(jnp.uint8)
        return jnp.where(a < 4, (a + bump) % 4, a), lanes[0][0, 0]

    timed_chain("extract_packed_lanes", f_extract, codes)

    # materialize packed lanes once for downstream stages
    lanes = extract_packed_lanes(codes, qual_ok, lens, k)
    flat = tuple(x.reshape(-1) for x in lanes)
    N = flat[0].shape[0]
    weff = len(flat)
    print(f"record rows N={N} weff={weff}")

    # --- stage 2: the initial record sort alone ---
    def f_sort(a, i):
        out = jax.lax.sort(a, num_keys=weff, is_stable=False)
        h = out[-1][0]
        a2 = tuple(x ^ (h & jnp.uint32(1)) for x in out)
        return a2, h

    timed_chain("record sort (lax.sort)", f_sort, flat)

    # sorted lanes for the scan/split stages
    sorted_lanes = jax.lax.sort(flat, num_keys=weff, is_stable=False)

    # --- stage 3: fused packed scan ---
    from mhm2_proxy_tpu.ops.pallas_scan import TILE as SCAN_TILE, group_sums_scan_packed

    free = 32 * weff - 2 * k
    keymask_int = 0xFFFFFFFF ^ ((1 << free) - 1)
    Np = -(-N // SCAN_TILE) * SCAN_TILE
    lanes_p = tuple(
        jnp.concatenate([x, jnp.full((Np - N,), 0xFFFFFFFF, jnp.uint32)]) for x in sorted_lanes
    )

    def f_scan(a, i):
        p = group_sums_scan_packed(a, keymask_int, 10000)
        h = p[0][0]
        return tuple(x ^ (h & jnp.uint32(1)) for x in a), h

    timed_chain("group_sums_scan_packed", f_scan, lanes_p)

    # --- stage 4: full aggregate_split_packed (sort+scan+split) ---
    def f_aggsplit(a, i):
        out = C.aggregate_split_packed(a, k, 2)
        h = out[0][0, 0]
        return tuple(x ^ (h & jnp.uint32(1)) for x in a), h

    timed_chain("aggregate_split_packed (full)", f_aggsplit, flat)

    # --- edges at table scale ---
    T = 1 << 23  # ~8.4M rows, the bench table's trimmed size class
    keys = np.sort(rng.integers(0, 1 << 42, T, dtype=np.uint64))
    twords = jnp.asarray(
        np.stack([(keys >> 10).astype(np.uint32),
                  ((keys & 0x3FF) << 22).astype(np.uint32)], axis=-1)
    )
    tcnt = jnp.asarray(rng.integers(2, 100, T, dtype=np.int32))
    tleft = jnp.asarray(rng.integers(0, 4, T, dtype=np.uint8))
    tright = jnp.asarray(rng.integers(0, 4, T, dtype=np.uint8))
    tn = jnp.int32(T - 1000)

    def f_edges(a, i):
        e = build_edges(a, tcnt, tleft, tright, tn, k)
        h = e["r_idx"][0].astype(jnp.uint32)
        return a ^ (h & jnp.uint32(1)), h

    timed_chain(f"build_edges (T={T})", f_edges, twords, lo=1, hi=3)

    # edges sub-pieces: the join's forward sort and back-route sort
    from mhm2_proxy_tpu.ops import bitkmer as bk

    q = jnp.concatenate([twords, twords])  # 2T queries, key-shaped
    ext_pay = tleft.astype(jnp.uint32) | (tright.astype(jnp.uint32) << jnp.uint32(3))

    def f_join(a, i):
        idx2, found2, pay2 = __import__(
            "mhm2_proxy_tpu.ops.lookup", fromlist=["table_join_payload"]
        ).table_join_payload(twords, tn, a, ext_pay, payload_bits=6)
        h = idx2[0].astype(jnp.uint32)
        return a ^ (h & jnp.uint32(1))[None, None], h

    timed_chain(f"table_join_payload (3T rows)", f_join, q, lo=1, hi=3)


if __name__ == "__main__":
    main()
