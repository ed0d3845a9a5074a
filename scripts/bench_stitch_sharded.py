#!/usr/bin/env python3
"""Sharded stitch at >=1M-row tables on the 8-device mesh (VERDICT r2 #4).

Synthesizes a path structure directly (random simple paths over the global
node set, with tunable shard locality emulating minimizer sharding), runs
stitch_paths_sharded, and reports wall time, executed collective rounds vs
the static bound, and all_to_all volume. Run on the virtual CPU mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_stitch_sharded.py [rows_total] [mean_path_len]
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# this environment pre-imports jax with JAX_PLATFORMS=axon (sitecustomize);
# env is too late — force the platform through jax.config (see tests/conftest)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np


def synth_paths(rng, n_nodes: int, mean_len: int, S: int, locality: int):
    """Assign nodes to random simple paths; consecutive path nodes stay on
    one shard for ~`locality` hops (the minimizer-locality analog)."""
    T = n_nodes // S
    # build paths over a permutation of nodes, assigning global ids so that
    # runs of `locality` consecutive path nodes share a shard
    perm = []
    free = [list(range(s * T, (s + 1) * T)) for s in range(S)]
    order = rng.permutation(S * T)
    ptr = [0] * S
    shard_seq = []
    s_cur = int(rng.integers(S))
    run = 0
    for _ in range(S * T):
        if run >= locality or ptr[s_cur] >= T:
            choices = [s for s in range(S) if ptr[s] < T]
            s_cur = int(rng.choice(choices))
            run = 0
        perm.append(s_cur * T + ptr[s_cur])
        ptr[s_cur] += 1
        run += 1
        shard_seq.append(s_cur)
    perm = np.asarray(perm, np.int64)

    # cut the permutation into paths of ~mean_len
    lens = []
    left = n_nodes
    while left > 0:
        L = int(np.clip(rng.geometric(1.0 / mean_len), 1, left))
        lens.append(L)
        left -= L
    return perm, lens, T


def main():
    import jax
    import jax.numpy as jnp
    from mhm2_proxy_tpu.parallel.sharded import ShardedTable, make_shard_mesh
    from mhm2_proxy_tpu.dbjg.stitch_sharded import stitch_paths_sharded

    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    mean_len = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    S = len(jax.devices())
    k = 21
    rng = np.random.default_rng(0)
    perm, lens, T = synth_paths(rng, n_nodes, mean_len, S, locality=8)

    # edges: path nodes chain L-to-R in permutation order (canonical fwd)
    r_gid = np.full(S * T, 0, np.int32)
    r_ok = np.zeros(S * T, bool)
    l_gid = np.full(S * T, 0, np.int32)
    l_ok = np.zeros(S * T, bool)
    pos = 0
    for L in lens:
        seg = perm[pos : pos + L]
        r_gid[seg[:-1]] = seg[1:]
        r_ok[seg[:-1]] = True
        l_gid[seg[1:]] = seg[:-1]
        l_ok[seg[1:]] = True
        pos += L
    ports_r = np.zeros(S * T, np.int32)  # enter neighbor via L
    ports_l = np.ones(S * T, np.int32)  # enter neighbor via R

    mesh = make_shard_mesh(S)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(mesh.axis_names))
    W = 2
    words = jax.device_put(
        rng.integers(0, 1 << 32, (S, T, W), dtype=np.uint64).astype(np.uint32), sh
    )
    count = jax.device_put(np.full((S, T), 3, np.int32), sh)
    shaped = lambda a: jax.device_put(a.reshape(S, T), sh)
    table = ShardedTable(
        k, words, count, None, None,
        jnp.full((S,), T, jnp.int32), mesh,
    )
    edges = dict(
        uu=shaped(np.ones(S * T, bool)),
        r_gid=shaped(r_gid), r_port=shaped(ports_r), r_ok=shaped(r_ok),
        l_gid=shaped(l_gid), l_port=shaped(ports_l), l_ok=shaped(l_ok),
    )

    stats = {}
    t0 = time.perf_counter()
    contigs = stitch_paths_sharded(table, edges, k, stats=stats)
    wall = time.perf_counter() - t0
    # second run: warm compile cache
    stats2 = {}
    t0 = time.perf_counter()
    contigs = stitch_paths_sharded(table, edges, k, stats=stats2)
    wall_warm = time.perf_counter() - t0

    assert len(contigs) == len(lens), (len(contigs), len(lens))
    print(json.dumps(dict(
        rows=S * T, shards=S, mean_path_len=mean_len, n_paths=len(lens),
        wall_s_cold=round(wall, 2), wall_s_warm=round(wall_warm, 2),
        **stats2,
    )))


if __name__ == "__main__":
    main()
