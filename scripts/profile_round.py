#!/usr/bin/env python3
"""Per-sub-op timing of the production counting round on the real TPU.

Fences with device_get (block_until_ready is a no-op through the axon
tunnel). Mirrors bench.py's workload exactly.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def fence(tree):
    # one batched device_get = ONE tunnel round-trip for all leaves
    import jax

    leaves = [x[(0,) * x.ndim] for x in jax.tree.leaves(tree) if hasattr(x, "ndim")]
    if leaves:
        jax.device_get(leaves)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.kcount.kmer_store import FinalTable
    from mhm2_proxy_tpu.dbjg.traverse import build_edges, fit_table_rows
    from mhm2_proxy_tpu.ops import count as C
    from mhm2_proxy_tpu.constants import minimizer_len_for_k

    k = 21
    m = minimizer_len_for_k(k)
    B, L = 131072, 160
    n_blocks = 2
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 8_000_000, dtype=np.uint8)
    blocks = []
    for _ in range(n_blocks):
        starts = rng.integers(0, len(genome) - L, B)
        codes = np.stack([genome[s : s + L] for s in starts])
        qual_ok = rng.random((B, L)) > 0.02
        lens = np.full((B,), L, np.int32)
        blocks.append((jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens)))
    fence(blocks)

    def t(label, fn, *a, n=3, **kw):
        out = fn(*a, **kw)  # warm/compile
        fence(out)
        best = 1e18
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            fence(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:42s} {best*1e3:9.1f} ms", flush=True)
        return out

    cb, qb, lb = blocks[0]
    run = t("block_to_split_run (1 block, 18.1M rec)", C.block_to_split_run, cb, qb, lb, k, m)
    run0, ns0 = run
    h = np.asarray(jax.device_get(ns0))
    print(f"  occupancy: multi={h[0]} single={h[1]}")

    trimmed = KmerCountStore._trim(run0, int(h[0]), int(h[1]))
    print(f"  trimmed shapes: multi={trimmed[0].shape} single={trimmed[5].shape}")

    # second block -> trimmed run 2
    cb2, qb2, lb2 = blocks[1]
    run2, ns2 = C.block_to_split_run(cb2, qb2, lb2, k, m)
    h2 = np.asarray(jax.device_get(ns2))
    trimmed2 = KmerCountStore._trim(run2, int(h2[0]), int(h2[1]))

    store = KmerCountStore(k)

    def merge_split(a, b):
        return store._merge_split(a, b)

    merged = t("merge_split (2 runs)", merge_split, trimmed, trimmed2)

    def final_fold(a):
        return C.merge_aggregates(*a[:4], *C.expand_singles(a[5], a[6], a[7]))

    folded = t("final fold (expand_singles + merge)", final_fold, merged)

    tab = t("finalize_table", lambda mm: C.finalize_table(*mm, dmin_thres=2), folded)
    words, cnt, left, right, n = tab
    table = FinalTable(k, words, cnt, left, right, n)
    print(f"  table kmers: {int(np.asarray(n))} cap {words.shape}")

    tbl = fit_table_rows(table)
    t("build_edges", build_edges, tbl.words, tbl.count, tbl.left, tbl.right, tbl.n, k)

    # sub-pieces of block_to_split_run
    rec = t("  read_kmer_records", lambda: C.read_kmer_records(cb, qb, lb, k, m))
    t("  aggregate_records", lambda: C.aggregate_records(
        rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"]))


if __name__ == "__main__":
    main()
