#!/usr/bin/env python3
"""Block record sort attack study (VERDICT r3 #6: the ~120 ms residual).

The raw-LSM block push is ONE lax.sort of ~18M records x 2 u32 lanes
(ops/count.py block_to_raw_run). This measures every TPU-feasible
alternative formulation at the production shape so the BASELINE.md
speed-of-light row reflects MEASURED options, not estimates:

  flat        — the production lax.sort (2 lanes, both keys)
  fused64     — ONE u64 lane (key fusion halves comparator count but i64
                vector lanes cost ~2x on the VPU)
  batched     — lax.sort of (T, 32768) tiles (the hierarchical first step:
                XLA sorts tiles independently; measures whether a
                local-sort + merge-tree decomposition could win)
  merge_last  — sort two pow2 halves + one Pallas bitonic merge (peels the
                final comparator stage out of lax.sort into the 2.4x-faster
                merge network)

A true LSD radix (the ~15 ms bytes-moved bound) needs a cross-tile scatter
per digit pass — the XLA:TPU anti-pattern (a single 9-lane scatter at 573k
rows measured 25 ms, ops/count.py) and unsupported as a vector op in
Mosaic, so no radix variant exists to measure; the bound is unreachable on
this hardware model and the merge-based LSM stands. Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    N = 131072 * 140  # production block record count (B=131072, L=160, k=21)
    Np = 1 << 25  # pow2 super-shape for the split variants (3.35e7 > N? no)
    rng = np.random.default_rng(0)
    # two u32 key lanes, realistic entropy (canonical kmers: high bits vary)
    a = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32))

    def timed(fn, *args):
        out = jax.jit(fn)(*args)
        jax.device_get([x[0] for x in jax.tree.leaves(out)])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.jit(fn)(*args)
            jax.device_get([x[0] for x in jax.tree.leaves(out)])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    res = {}

    res["flat_s"] = timed(
        lambda x, y: jax.lax.sort((x, y), num_keys=2, is_stable=False), a, b
    )

    def fused64(x, y):
        v = (x.astype(jnp.uint64) << jnp.uint64(32)) | y.astype(jnp.uint64)
        s = jax.lax.sort((v,), num_keys=1, is_stable=False)[0]
        return (s >> jnp.uint64(32)).astype(jnp.uint32), s.astype(jnp.uint32)

    with jax.enable_x64(True):
        res["fused64_s"] = timed(fused64, a, b)

    TILE = 1 << 15
    T = N // TILE

    def batched(x, y):
        return jax.lax.sort(
            (x[: T * TILE].reshape(T, TILE), y[: T * TILE].reshape(T, TILE)),
            dimension=1, num_keys=2, is_stable=False,
        )

    res["batched_tiles_s"] = timed(batched, a, b)

    half = 1 << 23  # two pow2 halves (8.4M + rest-padded half)
    from mhm2_proxy_tpu.ops.pallas_sort import merge_sorted_lanes_padded

    def merge_last(x, y):
        s1 = jax.lax.sort((x[:half], y[:half]), num_keys=2, is_stable=False)
        s2 = jax.lax.sort((x[half:], y[half:]), num_keys=2, is_stable=False)
        return merge_sorted_lanes_padded(s1, s2, kw=2)

    res["halves_plus_merge_s"] = timed(merge_last, a, b)

    res = {k: round(v, 4) for k, v in res.items()}
    best = min(res, key=res.get)
    print(json.dumps({
        "metric": "block_record_sort_s",
        "value": res["flat_s"],
        "unit": "s",
        "detail": {"n_records": N, **res, "best": best,
                   "platform": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
