#!/usr/bin/env python3
"""Sharding-overhead proxy for weak-scaling efficiency (BASELINE.md row).

TRUE weak scaling (fixed work per shard, growing shard count on real chips)
cannot be measured on this box: the 8 "devices" are a virtual CPU mesh pinned
to 2 physical cores, so S x the total work serializes onto the same silicon
and the naive metric measures core oversubscription, not the framework.

What IS measurable here: the sharding OVERHEAD at fixed total volume. The
S-shard run does the same aggregate compute as the 1-shard run plus
everything sharding adds (minimizer routing, supermer packing, bucketized
all_to_all, spill rounds, per-shard LSM merges, receiver re-expansion).

BASELINE FAIRNESS (VERDICT r4 weak #5): the round-2 run measured the 1-shard
baseline INSIDE the 8-virtual-device process, where the forced device split
denies XLA:CPU its intra-op thread pool — the sharded run then looked 1.6x
"better than perfect", which is not credible as an efficiency claim. The
single-shard baseline now runs in its own subprocess on an UNSPLIT host
platform (XLA:CPU intra-op threading over all cores — the best-known
single-host 1-shard configuration); the in-mesh 1-shard time is also
reported for the decomposition. Efficiency = best_single / t_S.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/bench_weak_scaling.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

_SINGLE_MODE = "--single-subprocess" in sys.argv


def _make_data(k: int):
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
    return data, B, L


def run_single(data, k: int):
    import jax
    import jax.numpy as jnp

    from mhm2_proxy_tpu.kcount import KmerCountStore

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


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    k = 21
    data, B, L = _make_data(k)

    if _SINGLE_MODE:
        t1, n1 = run_single(data, k)
        print(json.dumps({"t": t1, "n": n1}))
        return

    from mhm2_proxy_tpu.parallel.sharded import ShardedCounter, make_shard_mesh

    n_dev = len(jax.devices())

    # best-known single-host 1-shard config: an UNSPLIT host platform where
    # XLA:CPU keeps its intra-op thread pool (subprocess, no device split)
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, __file__, "--single-subprocess"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    single = json.loads(r.stdout.strip().splitlines()[-1])
    t1_best, n1 = single["t"], single["n"]
    print(f"single-shard (unsplit host): {t1_best:.2f}s, kmers={n1}",
          file=sys.stderr)

    # in-mesh 1-shard reference (the round-2 baseline, kept for decomposition)
    t1_mesh, n1_mesh = run_single(data, k)
    assert n1_mesh == n1, (n1_mesh, n1)
    print(f"single-shard (in-mesh, split host): {t1_mesh:.2f}s", file=sys.stderr)

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

    results = {}
    for S in (2, 4, 8):
        if S > n_dev:
            continue
        tS, nS = run_sharded(S)
        assert nS == n1, f"sharded table kmers {nS} != single {n1}"
        results[S] = tS
        print(f"S={S}: {tS:.2f}s, kmers={nS}, eff={t1_best/tS:.2%}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "sharding_overhead_efficiency_fixed_volume",
        "total_kmers_per_block": B * (L - k + 1),
        "single_shard_unsplit_host_s": round(t1_best, 3),
        "single_shard_in_mesh_s": round(t1_mesh, 3),
        "times_s": {str(s): round(t, 3) for s, t in results.items()},
        "efficiency_vs_best_single": {
            str(S): round(t1_best / t, 4) for S, t in results.items()
        },
        "note": "fixed-total-volume proxy on a 2-core virtual mesh; baseline "
                "= 1-shard on an UNSPLIT host (intra-op threads) — the "
                "best-known single-host config. Interconnect efficiency "
                "needs real multi-chip hardware.",
    }))


if __name__ == "__main__":
    main()
