"""Benchmark: k-mer counting throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is canonical k-mers counted per second through the full hot path
(record extraction incl. minimizer sharding hash + sort + segmented reduce),
k=21 on synthetic 150bp reads — the bandwidth-critical stage of the pipeline
(reference SURVEY.md §3.3). vs_baseline is measured against 10 Mkmers/s/core,
the ballpark of the reference's CPU backend on one core (BASELINE.md defines
no published throughput; this constant is our recorded north star).
"""

import json
import sys
import time

import numpy as np

BASELINE_KMERS_PER_SEC = 10e6


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mhm2_proxy_tpu.ops import count as C
    from mhm2_proxy_tpu.constants import minimizer_len_for_k

    k = 21
    m = minimizer_len_for_k(k)
    B, L = 4096, 160
    rng = np.random.default_rng(0)
    # reads drawn from a synthetic genome so duplicate kmers exist
    genome = rng.integers(0, 4, 1_000_000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = np.stack([genome[s : s + L] for s in starts])
    qual_ok = rng.random((B, L)) > 0.02
    lens = np.full((B,), L, np.int32)

    @jax.jit
    def step(codes, qual_ok, lens):
        rec = C.read_kmer_records(codes, qual_ok, lens, k, m, n_shards=8)
        agg = C.aggregate_records(
            rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"]
        )
        return agg[0], agg[4]

    codes_d = jnp.asarray(codes)
    qual_ok_d = jnp.asarray(qual_ok)
    lens_d = jnp.asarray(lens)

    # warmup/compile
    w, n = step(codes_d, qual_ok_d, lens_d)
    w.block_until_ready()

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        w, n = step(codes_d, qual_ok_d, lens_d)
    w.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    kmers_per_block = B * (L - k - 1)  # counted positions per read: len-k-1
    value = kmers_per_block / dt
    print(
        json.dumps(
            {
                "metric": "kmers_counted_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "kmers/s",
                "vs_baseline": round(value / BASELINE_KMERS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
