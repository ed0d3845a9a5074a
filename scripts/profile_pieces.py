#!/usr/bin/env python3
"""Micro-time individual pieces of the aggregation pipeline on presorted data."""

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

    N, W = 573440, 2
    rng = np.random.default_rng(0)
    # presorted keyed rows with duplicates
    keys = np.sort(rng.integers(0, N // 4, N).astype(np.uint64))
    words = np.stack([(keys >> 32).astype(np.uint32), (keys & 0xFFFFFFFF).astype(np.uint32)], axis=-1)
    words = jnp.asarray(words)
    cnt = jnp.asarray(rng.integers(1, 3, N).astype(np.int32))
    l4 = jnp.asarray(rng.integers(0, 2, (N, 4)).astype(np.int32))
    r4 = jnp.asarray(rng.integers(0, 2, (N, 4)).astype(np.int32))
    ext = jnp.asarray(rng.integers(0, 256, N).astype(np.uint8))
    print(f"platform={jax.devices()[0].platform} N={N}", flush=True)

    def h_of(x):
        return x.reshape(-1)[0].astype(jnp.uint32)

    def perturb(words, h):
        return words ^ (h & jnp.uint32(1))

    def make(fn):
        def chain(iters):
            @jax.jit
            def many(words):
                def body(i, carry):
                    w, acc = carry
                    h = fn(w)
                    return perturb(w, h), acc + h

                return jax.lax.fori_loop(0, iters, body, (words, jnp.uint32(0)))[1]

            return many

        return chain

    def v_cumsum9(w):
        pay = jnp.concatenate([cnt[:, None], l4, r4], axis=1)
        pay = pay + w[:, :1].astype(jnp.int32)
        cs = jnp.cumsum(pay, axis=0, dtype=jnp.int32)
        return h_of(cs.astype(jnp.uint32))

    def v_scatter9(w):
        pay = jnp.concatenate([cnt[:, None], l4, r4], axis=1) + w[:, :1].astype(jnp.int32)
        dest = (w[:, 1] & jnp.uint32(0x7FFFF)).astype(jnp.int32)
        out = jnp.zeros((N + 1, 9), jnp.int32).at[dest].set(pay, mode="drop")[:N]
        return h_of(out.astype(jnp.uint32))

    def v_dedup_scatter(w):
        out = C._dedup_sorted(w, cnt, l4, r4)
        return h_of(out[0]) + out[4].astype(jnp.uint32)

    def v_dedup_bounded(w):
        out = C._dedup_sorted_bounded(w, cnt, l4, r4, mult=2)
        return h_of(out[0]) + out[4].astype(jnp.uint32)

    def v_flagsort_packed(w):
        flag = (cnt > 1).astype(jnp.uint32) ^ w[:, 0] % 2
        packed = C._pack_sums(cnt, l4, r4)
        out = jax.lax.sort((flag,) + tuple(w[:, i] for i in range(W)) + packed, num_keys=1, is_stable=True)
        return h_of(out[1]) + h_of(out[3].astype(jnp.uint32))

    def v_flagsort_ext(w):
        flag = (cnt > 1).astype(jnp.uint32) ^ w[:, 0] % 2
        out = jax.lax.sort((flag,) + tuple(w[:, i] for i in range(W)) + (ext,), num_keys=1, is_stable=True)
        return h_of(out[1]) + h_of(out[3].astype(jnp.uint32))

    def v_split(w):
        out = C.split_run(w, cnt, l4, r4, jnp.int32(N - 7))
        return h_of(out[0]) + out[4].astype(jnp.uint32) + h_of(out[5])

    variants = [
        ("cumsum9", v_cumsum9),
        ("scatter9", v_scatter9),
        ("dedup_scat", v_dedup_scatter),
        ("dedup_bnd2", v_dedup_bounded),
        ("flag_pack5", v_flagsort_packed),
        ("flag_ext1", v_flagsort_ext),
        ("split_run", v_split),
    ]
    for name, fn in variants:
        chain = make(fn)
        ts = {}
        for iters in (2, 12):
            cfn = chain(iters)
            np.asarray(cfn(words))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(cfn(words))
                best = min(best, time.perf_counter() - t0)
            ts[iters] = best
        per_iter = (ts[12] - ts[2]) / 10
        print(f"{name:10s} {per_iter*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
