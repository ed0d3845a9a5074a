#!/usr/bin/env python3
"""End-to-end single-chip round benchmark on the default (TPU) platform.

Times a complete counting round (record extraction -> aggregation -> LSM
merges -> finalize -> edge building) on synthetic reads, reporting k-mers/s
end-to-end — a stricter number than bench.py's steady-state aggregate step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.dbjg import traverse_debruijn_graph
    from mhm2_proxy_tpu.dbjg.traverse import build_edges, _pad_pow2

    k = 21
    B, L = 4096, 160
    n_blocks = 4
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    blocks = []
    for _ in range(n_blocks):
        starts = rng.integers(0, len(genome) - L, B)
        codes = np.stack([genome[s : s + L] for s in starts])
        qual_ok = rng.random((B, L)) > 0.02
        lens = np.full((B,), L, np.int32)
        blocks.append((codes, qual_ok, lens))

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)

    def one_round():
        store = KmerCountStore(k)
        for b in blocks:
            store.add_reads_block(*b)
        table = store.finalize()
        tbl = _pad_pow2(table)
        edges = build_edges(tbl.words, tbl.count, tbl.left, tbl.right, tbl.n, k)
        jax.block_until_ready(edges)
        return table

    # warmup compiles every shape of the identical timed pass
    one_round()
    t0 = time.perf_counter()
    table = one_round()
    dt = time.perf_counter() - t0

    kmers = n_blocks * B * (L - k - 1)
    print(
        f"end-to-end round: {kmers} kmers in {dt:.3f}s = {kmers/dt/1e6:.1f} Mkmers/s; "
        f"table {int(table.n)} kmers"
    )


if __name__ == "__main__":
    main()
