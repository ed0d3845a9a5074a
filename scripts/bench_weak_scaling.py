#!/usr/bin/env python3
"""Sharding-overhead proxy for weak-scaling efficiency (BASELINE.md row).

TRUE weak scaling (fixed work per shard, growing shard count on real chips)
cannot be measured on this box: the 8 "devices" are a virtual CPU mesh pinned
to 2 physical cores, so S x the total work serializes onto the same silicon
and the naive metric measures core oversubscription, not the framework.

What IS measurable here: the sharding OVERHEAD at fixed total volume. The
S-shard run does the same aggregate compute as the 1-shard run plus
everything sharding adds (minimizer routing, supermer packing, bucketized
all_to_all, spill rounds, per-shard LSM merges, receiver re-expansion). On a
fixed host, T_1 / T_S is therefore the per-chip efficiency the exchange
machinery would deliver at scale ASSUMING ideal interconnect — the
framework-side component of weak-scaling efficiency. (>= 0.85 claimed;
the interconnect component needs real multi-chip hardware.)

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
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.parallel.sharded import ShardedCounter, make_shard_mesh

    n_dev = len(jax.devices())
    k = 21
    B, L = 8192, 160  # TOTAL reads per block (fixed across shard counts)
    n_blocks = 4
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 1_000_000, dtype=np.uint8)

    data = []
    for _ in range(n_blocks):
        starts = rng.integers(0, len(genome) - L, B)
        codes = np.stack([genome[s : s + L] for s in starts])
        qual_ok = np.ones((B, L), bool)
        lens = np.full((B,), L, np.int32)
        data.append((codes, qual_ok, lens))

    def run_single():
        import jax.numpy as jnp

        store = KmerCountStore(k)
        for c, q, l in data:
            store.add_reads_block(jnp.asarray(c), jnp.asarray(q), jnp.asarray(l))
        t = store.finalize()
        np.asarray(jax.device_get(t.n))
        t0 = time.perf_counter()
        store = KmerCountStore(k)
        for c, q, l in data:
            store.add_reads_block(jnp.asarray(c), jnp.asarray(q), jnp.asarray(l))
        t = store.finalize()
        n = int(np.asarray(jax.device_get(t.n)))
        return time.perf_counter() - t0, n

    def run_sharded(S):
        mesh = make_shard_mesh(S)
        store = ShardedCounter(k, mesh)
        for blk in data:
            store.add_reads_block(*blk)
        t = store.finalize()
        np.asarray(jax.device_get(t.n))
        t0 = time.perf_counter()
        store = ShardedCounter(k, mesh)
        for blk in data:
            store.add_reads_block(*blk)
        table = store.finalize()
        n = int(np.asarray(jax.device_get(table.n)).sum())
        return time.perf_counter() - t0, n

    t1, n1 = run_single()
    print(f"single-shard: {t1:.2f}s, kmers={n1}", file=sys.stderr)
    results = {1: t1}
    for S in (2, 4, 8):
        if S > n_dev:
            continue
        tS, nS = run_sharded(S)
        assert nS == n1, f"sharded table kmers {nS} != single {n1}"
        results[S] = tS
        print(f"S={S}: {tS:.2f}s, kmers={nS}, overhead-eff={t1/tS:.2%}", file=sys.stderr)
    eff = {str(S): round(t1 / t, 4) for S, t in results.items()}
    print(json.dumps({
        "metric": "sharding_overhead_efficiency_fixed_volume",
        "total_kmers_per_block": B * (L - k + 1),
        "times_s": {str(s): round(t, 3) for s, t in results.items()},
        "efficiency_vs_single_shard": eff,
        "note": "fixed-total-volume proxy on a 2-core virtual mesh: isolates "
                "the framework's sharding overhead (routing/exchange/spill/"
                "per-shard LSM) from interconnect, which needs real chips",
    }))


if __name__ == "__main__":
    main()
