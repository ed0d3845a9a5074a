#!/usr/bin/env python3
"""lax.sort scaling vs chunked-sort + Pallas bitonic merge (TPU)."""

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
    NTOT = 1 << 24  # 16.8M ~ one block's record count
    LANES = 3  # 2 key words + 1 packed payload (the aggregate key sort)
    data = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, NTOT, dtype=np.uint64).astype(np.uint32))
        for _ in range(LANES)
    )
    for x in data:
        np.asarray(jax.device_get(x[0]))

    def timeit(label, fn, *a, n=3):
        out = fn(*a)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0][0]))
        best = 1e18
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*a)
            np.asarray(jax.device_get(jax.tree.leaves(out)[0][-1]))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:38s} {best*1e3:8.1f} ms", flush=True)
        return best

    # lax.sort at several sizes
    for sh in (5, 3, 2, 1, 0):
        n = NTOT >> sh
        f = jax.jit(lambda d, n=n: jax.lax.sort(tuple(x[:n] for x in d), num_keys=2, is_stable=True))
        timeit(f"lax.sort {n>>20}M x {LANES} lanes", f, data)

    # chunked: C sorted chunks + log2(C) rounds of pairwise bitonic merges
    for C in (2, 4, 8, 16):
        n = NTOT // C

        @jax.jit
        def chunked(d, C=C, n=n):
            runs = [
                jax.lax.sort(tuple(x[i * n : (i + 1) * n] for x in d), num_keys=2, is_stable=True)
                for i in range(C)
            ]
            while len(runs) > 1:
                nxt = []
                for i in range(0, len(runs), 2):
                    nxt.append(merge_sorted_lanes(tuple(runs[i]), tuple(runs[i + 1]), kw=2))
                runs = nxt
            return runs[0]

        timeit(f"chunked {C}x{n>>20}M + bitonic merges", chunked, data)


if __name__ == "__main__":
    main()
