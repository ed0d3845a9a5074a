#!/usr/bin/env python3
"""Stage-by-stage timing of the counting round on the default platform.

Diagnoses where the full-round path stalls on the remote TPU (bench.py's
single aggregate step is known-good; this brackets merges/finalize/edges).
"""

import os
import sys
import time
import faulthandler

faulthandler.dump_traceback_later(int(os.environ.get("DBG_TIMEOUT", "520")), exit=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mhm2_proxy_tpu.ops import count as C
    from mhm2_proxy_tpu.constants import minimizer_len_for_k

    k, m = 21, minimizer_len_for_k(21)
    B, L = 4096, 160
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 500_000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = jnp.asarray(np.stack([genome[s : s + L] for s in starts]))
    qual_ok = jnp.asarray(rng.random((B, L)) > 0.02)
    lens = jnp.asarray(np.full((B,), L, np.int32))
    log(f"platform {jax.devices()[0].platform}")

    t0 = time.time()
    rec = C.read_kmer_records(codes, qual_ok, lens, k, m)
    jax.block_until_ready(rec)
    log(f"records {time.time()-t0:.1f}s")

    t0 = time.time()
    agg = C.aggregate_records(rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"])
    jax.block_until_ready(agg)
    log(f"aggregate {time.time()-t0:.1f}s shape={agg[0].shape}")

    t0 = time.time()
    mrg = C.merge_aggregates(*agg[:4], *agg[:4])
    jax.block_until_ready(mrg)
    log(f"merge {time.time()-t0:.1f}s shape={mrg[0].shape}")

    t0 = time.time()
    fin = C.finalize_table(*mrg)
    jax.block_until_ready(fin)
    log(f"finalize {time.time()-t0:.1f}s")

    t0 = time.time()
    n = int(fin[4])
    log(f"n transfer {time.time()-t0:.1f}s n={n}")

    from mhm2_proxy_tpu.dbjg.traverse import build_edges
    from mhm2_proxy_tpu.kcount.kmer_store import FinalTable
    from mhm2_proxy_tpu.dbjg.traverse import _pad_pow2

    tbl = _pad_pow2(FinalTable(k, fin[0], fin[1], fin[2], fin[3], fin[4]))
    t0 = time.time()
    e = build_edges(tbl.words, tbl.count, tbl.left, tbl.right, tbl.n, k)
    jax.block_until_ready(e)
    log(f"edges {time.time()-t0:.1f}s")

    t0 = time.time()
    _ = jax.device_get(e["uu"])
    log(f"edges transfer {time.time()-t0:.1f}s")
    log("ALL OK")


if __name__ == "__main__":
    main()
