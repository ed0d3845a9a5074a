#!/usr/bin/env python3
"""Smith-Waterman GCUPS benchmark on the default (TPU) platform.

GCUPS = giga cell updates per second = B * Lq * Lr / time. The reference's
ADEPT GPU kernel (BMC Bioinformatics 21:406) reports ~30-60 GCUPS on V100 for
short reads; this measures our batched wavefront kernel per chip.
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
    import jax.numpy as jnp
    from mhm2_proxy_tpu.ops.ssw import sw_align_ends

    B, Lq, Lr = 8192, 128, 160
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, (B, Lr), dtype=np.uint8)
    q = ref[:, 16 : 16 + Lq].copy()
    mut = rng.random((B, Lq)) < 0.05
    q[mut] = (q[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
    ql = np.full(B, Lq, np.int32)
    rl = np.full(B, Lr, np.int32)

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    args = (jnp.asarray(q), jnp.asarray(ql), jnp.asarray(ref), jnp.asarray(rl))
    out = sw_align_ends(*args)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = sw_align_ends(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    cells = B * Lq * Lr
    print(f"SW: {B} pairs {Lq}x{Lr} in {dt*1e3:.2f} ms = {cells/dt/1e9:.2f} GCUPS")


if __name__ == "__main__":
    main()
