#!/usr/bin/env python3
"""Decompose the TPU cost of the read-pass aggregation (the headline hot path).

Variants timed with the chained-in-jit trick (data-dependent iterations inside
one jit; two chain lengths differenced to cancel dispatch/RTT — see
bench.py docstring for why block_until_ready can't be trusted through the
axon tunnel):

  records   : read_kmer_records only (elementwise)
  sortonly  : + lexsort of (W keys) returning order, ONE gather of words
  sortgath  : + gathers of all payloads (current _lexsort_rows)
  varsort   : lax.sort carrying (cnt, left, right) through the sort network
              (no gathers), one-hot expansion AFTER the sort
  dedup     : full aggregate_records (sort+gathers+cumsum+scatters)
  split     : full block_to_split_run (adds split_run's two more sorts)
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
    from mhm2_proxy_tpu.constants import minimizer_len_for_k

    k = 21
    m = minimizer_len_for_k(k)
    B, L = 4096, 160
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = jnp.asarray(np.stack([genome[s : s + L] for s in starts]))
    qual_ok = jnp.asarray(rng.random((B, L)) > 0.02)
    lens = jnp.asarray(np.full((B,), L, np.int32))
    N = B * (L - k + 1)
    print(f"platform={jax.devices()[0].platform} N={N} rows (B={B}, L={L}, k={k})", flush=True)

    def perturb(codes, h):
        bump = (h & jnp.uint32(3)).astype(jnp.uint8)
        return jnp.where(codes < 4, (codes + bump) % 4, codes)

    def records_stage(codes):
        rec = C.read_kmer_records(codes, qual_ok, lens, k, m)
        return rec

    def h_of(x):
        return x.reshape(-1)[0].astype(jnp.uint32)

    def make(fn):
        def chain(iters):
            @jax.jit
            def many(codes):
                def body(i, carry):
                    codes, acc = carry
                    h = fn(codes)
                    return perturb(codes, h), acc + h

                return jax.lax.fori_loop(0, iters, body, (codes, jnp.uint32(0)))[1]

            return many

        return chain

    def v_records(codes):
        rec = records_stage(codes)
        return h_of(rec["words"]) + h_of(rec["count"].astype(jnp.uint32))

    def v_sortonly(codes):
        rec = records_stage(codes)
        w = C._sentinelize(rec["words"], rec["valid"])
        W = w.shape[-1]
        order = jnp.lexsort(tuple(w[:, i] for i in range(W - 1, -1, -1)))
        return h_of(w[order])

    def v_sortgath(codes):
        # legacy formulation kept for comparison: lexsort + post-sort gathers
        rec = records_stage(codes)
        w = C._sentinelize(rec["words"], rec["valid"])
        cnt = jnp.where(rec["valid"], rec["count"], 0).astype(jnp.int32)
        l4 = C._ext_onehot(rec["left"], cnt)
        r4 = C._ext_onehot(rec["right"], cnt)
        W = w.shape[-1]
        order = jnp.lexsort(tuple(w[:, i] for i in range(W - 1, -1, -1)))
        w, cnt, l4, r4 = (x[order] for x in (w, cnt, l4, r4))
        return h_of(w) + h_of(cnt.astype(jnp.uint32)) + h_of(l4.astype(jnp.uint32)) + h_of(r4.astype(jnp.uint32))

    def v_varsort(codes):
        rec = records_stage(codes)
        w = C._sentinelize(rec["words"], rec["valid"])
        cnt = jnp.where(rec["valid"], rec["count"], 0).astype(jnp.int32)
        W = w.shape[-1]
        ops = tuple(w[:, i] for i in range(W - 1, -1, -1)) + (cnt, rec["left"], rec["right"])
        out = jax.lax.sort(ops, num_keys=W)
        sw = jnp.stack([out[W - 1 - i] for i in range(W)], axis=-1)
        scnt = out[W]
        l4 = C._ext_onehot(out[W + 1], scnt)
        r4 = C._ext_onehot(out[W + 2], scnt)
        return h_of(sw) + h_of(scnt.astype(jnp.uint32)) + h_of(l4.astype(jnp.uint32)) + h_of(r4.astype(jnp.uint32))

    def v_dedup(codes):
        rec = records_stage(codes)
        agg = C.aggregate_records(rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"])
        return h_of(agg[0]) + agg[4].astype(jnp.uint32)

    def v_split(codes):
        out, ns = C.block_to_split_run(codes, qual_ok, lens, k, m)
        return h_of(out[0]) + ns[0].astype(jnp.uint32)

    variants = [
        ("records", v_records),
        ("sortonly", v_sortonly),
        ("sortgath", v_sortgath),
        ("varsort", v_varsort),
        ("dedup", v_dedup),
        ("split", v_split),
    ]
    for name, fn in variants:
        chain = make(fn)
        ts = {}
        for iters in (2, 12):
            cfn = chain(iters)
            np.asarray(cfn(codes))  # compile + warm
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(cfn(codes))
                best = min(best, time.perf_counter() - t0)
            ts[iters] = best
        per_iter = (ts[12] - ts[2]) / 10
        print(f"{name:9s} {per_iter*1e3:8.2f} ms/iter   ({N/per_iter/1e6:8.1f} Mrows/s)", flush=True)


if __name__ == "__main__":
    main()
