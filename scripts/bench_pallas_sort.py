#!/usr/bin/env python3
"""Pallas bitonic merge vs jax.lax.sort for merging two sorted runs (TPU)."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mhm2_proxy_tpu.ops.pallas_sort import merge_sorted_lanes

    rng = np.random.default_rng(0)
    N = 1 << 22  # 4M rows per run
    LANES = 7  # 2 key + 5 payload (the merge_aggregates packed layout)
    print(f"platform={jax.devices()[0].platform} 2x{N} rows, {LANES} lanes", flush=True)

    def mk(n):
        keys = np.sort(rng.integers(0, 1 << 62, n).astype(np.uint64))
        ls = [(keys >> 32).astype(np.uint32), (keys & 0xFFFFFFFF).astype(np.uint32)]
        ls += [rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32) for _ in range(LANES - 2)]
        return tuple(jnp.asarray(x) for x in ls)

    a, b = mk(N), mk(N)
    for x in a + b:
        np.asarray(jax.device_get(x[0]))

    @jax.jit
    def via_lax(a, b):
        ops = tuple(jnp.concatenate([x, y]) for x, y in zip(a, b))
        return jax.lax.sort(ops, num_keys=2, is_stable=True)

    @jax.jit
    def via_pallas(a, b):
        return merge_sorted_lanes(a, b, kw=2)

    for name, fn in (("lax.sort", via_lax), ("pallas_bitonic", via_pallas)):
        out = fn(a, b)  # compile + warm
        np.asarray(jax.device_get(out[0][0]))
        best = 1e18
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(a, b)
            np.asarray(jax.device_get(out[0][-1]))
            best = min(best, time.perf_counter() - t0)
        rows = 2 * N
        print(f"{name:15s} {best*1e3:8.1f} ms   ({rows/best/1e6:7.1f} Mrows/s, "
              f"{rows*LANES*4*2/best/1e9:6.1f} GB/s eff)", flush=True)
        # correctness spot check
        k = (np.asarray(out[0][:1000]).astype(np.uint64) << 32) | np.asarray(out[1][:1000])
        assert np.all(k[1:] >= k[:-1])


if __name__ == "__main__":
    main()
