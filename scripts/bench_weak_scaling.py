#!/usr/bin/env python3
"""Weak-scaling efficiency of the sharded counting round (BASELINE.md row).

Fixed work PER SHARD (blocks of reads drawn from a shared synthetic genome);
shard counts 1, 2, 4, 8 on a forced-host-device CPU mesh (the scale-out proxy
available on a one-chip box — the exchange pattern, spill loops, and LSM
merges are identical to the TPU path; only the per-device compute speed
differs). Efficiency(S) = T(1) / T(S) with S-proportional total input.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/bench_weak_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mhm2_proxy_tpu.parallel.sharded import ShardedCounter, make_shard_mesh

    n_dev = len(jax.devices())
    k = 21
    B, L = 1024, 160  # reads per shard per block
    n_blocks = 4
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 1_000_000, dtype=np.uint8)

    def blocks_for(S):
        out = []
        for _ in range(n_blocks):
            starts = rng.integers(0, len(genome) - L, S * B)
            codes = np.stack([genome[s : s + L] for s in starts])
            qual_ok = np.ones((S * B, L), bool)
            lens = np.full((S * B,), L, np.int32)
            out.append((codes, qual_ok, lens))
        return out

    def run(S):
        mesh = make_shard_mesh(S)
        data = blocks_for(S)
        store = ShardedCounter(k, mesh)
        # warm compile
        store.add_reads_block(*data[0])
        t = store.finalize()
        np.asarray(jax.device_get(t.n))
        store = ShardedCounter(k, mesh)
        t0 = time.perf_counter()
        for blk in data:
            store.add_reads_block(*blk)
        table = store.finalize()
        np.asarray(jax.device_get(table.n))
        dt = time.perf_counter() - t0
        return dt, int(np.asarray(jax.device_get(table.n)).sum())

    results = {}
    shard_counts = [s for s in (1, 2, 4, 8) if s <= n_dev]
    for S in shard_counts:
        dt, nk = run(S)
        results[S] = dt
        print(f"S={S}: {dt:.2f}s, table kmers={nk}, "
              f"eff={results[shard_counts[0]]/dt:.2%}", file=sys.stderr)
    eff = {S: round(results[shard_counts[0]] / results[S], 4) for S in shard_counts}
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "per_shard_kmers_per_block": B * (L - k + 1),
        "times_s": {str(s): round(t, 3) for s, t in results.items()},
        "efficiency": {str(s): e for s, e in eff.items()},
        "note": "virtual CPU mesh proxy; identical exchange/merge graph as TPU",
    }))


if __name__ == "__main__":
    main()
