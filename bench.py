"""Benchmark: full single-chip counting round + de Bruijn edge build.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

The headline metric is k-mers/s through the COMPLETE production round on one
chip: record extraction (incl. minimizer shard hash) -> per-block sort +
segment-reduce aggregation -> LSM merges -> finalize (extension calls, purge,
compaction) -> de Bruijn reciprocal-edge build. Stages are fenced with
block_until_ready so the number is an honest end-to-end wall measurement
(round-1 review: the old headline timed only the steady-state aggregate step
under pipelined dispatch; that microbench is still reported in detail as
"aggregate_only_kmers_per_sec" with its variance).

vs_baseline is measured against 10 Mkmers/s/core, the ballpark of the
reference's CPU backend on one core (BASELINE.md: the reference publishes no
throughput numbers; this constant is our recorded north star).
"""

import json
import statistics
import sys
import time

import numpy as np

BASELINE_KMERS_PER_SEC = 10e6


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.dbjg.traverse import build_edges, _pad_pow2
    from mhm2_proxy_tpu.ops import count as C
    from mhm2_proxy_tpu.constants import minimizer_len_for_k

    k = 21
    m = minimizer_len_for_k(k)
    B, L = 4096, 160
    n_blocks = 8
    rng = np.random.default_rng(0)
    # reads drawn from a synthetic genome so duplicate kmers exist
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    blocks = []
    for _ in range(n_blocks):
        starts = rng.integers(0, len(genome) - L, B)
        codes = np.stack([genome[s : s + L] for s in starts])
        qual_ok = rng.random((B, L)) > 0.02
        lens = np.full((B,), L, np.int32)
        blocks.append((jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens)))
    jax.block_until_ready(blocks)
    kmers_total = n_blocks * B * (L - k - 1)

    def run_round():
        times = {}
        store = KmerCountStore(k)
        t0 = time.perf_counter()
        for cb, qb, lb in blocks:
            store.add_reads_block(cb, qb, lb)
        jax.block_until_ready(store.runs)
        t1 = time.perf_counter()
        table = store.finalize()
        jax.block_until_ready((table.words, table.count))
        t2 = time.perf_counter()
        tbl = _pad_pow2(table)
        edges = build_edges(tbl.words, tbl.count, tbl.left, tbl.right, tbl.n, k)
        jax.block_until_ready(edges)
        t3 = time.perf_counter()
        times["count_aggregate_s"] = t1 - t0
        times["finalize_s"] = t2 - t1
        times["build_edges_s"] = t3 - t2
        times["total_s"] = t3 - t0
        return table, times

    # warmup compiles every shape of the identical timed pass
    table, _ = run_round()
    reps = []
    for _ in range(3):
        table, times = run_round()
        reps.append(times)
    best = min(reps, key=lambda t: t["total_s"])
    value = kmers_total / best["total_s"]

    # steady-state aggregate-only microbench (round-1 continuity metric)
    @jax.jit
    def agg_step(codes, qual_ok, lens):
        rec = C.read_kmer_records(codes, qual_ok, lens, k, m, n_shards=8)
        agg = C.aggregate_records(
            rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"]
        )
        return agg[0], agg[4]

    cb, qb, lb = blocks[0]
    w, n = agg_step(cb, qb, lb)
    w.block_until_ready()
    micro = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            w, n = agg_step(cb, qb, lb)
        w.block_until_ready()
        micro.append(B * (L - k - 1) * 10 / (time.perf_counter() - t0))

    detail = {
        "platform": jax.devices()[0].platform,
        "k": k,
        "kmers_per_round": kmers_total,
        "table_kmers": int(np.asarray(table.n)),
        **{kk: round(v, 4) for kk, v in best.items()},
        "round_total_s_all_reps": [round(t["total_s"], 4) for t in reps],
        "aggregate_only_kmers_per_sec": round(statistics.median(micro), 1),
        "aggregate_only_spread": [round(min(micro), 1), round(max(micro), 1)],
    }
    print(
        json.dumps(
            {
                "metric": "kmers_per_sec_full_round_per_chip",
                "value": round(value, 1),
                "unit": "kmers/s",
                "vs_baseline": round(value / BASELINE_KMERS_PER_SEC, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
