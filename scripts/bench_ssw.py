#!/usr/bin/env python3
"""Smith-Waterman GCUPS benchmark on the default (TPU) platform.

GCUPS = giga cell updates per second = B * Lq * Lr / time. The reference's
ADEPT GPU kernel (BMC Bioinformatics 21:406) reports ~30-60 GCUPS on V100 for
short reads; this measures our kernels per chip.

Timing methodology: the axon TPU tunnel makes block_until_ready a no-op and
adds ~10-30 ms RPC latency per fetch, so per-call host timing is useless.
Each measurement chains `iters` kernel calls inside ONE jit (each call's
query depends on the previous call's scores, so nothing can be elided or
cached) and differences two iteration counts to cancel the fixed overhead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mhm2_proxy_tpu.ops.ssw import _sw_align_ends_xla
    from mhm2_proxy_tpu.ops.pallas_ssw import pallas_sw_align_ends

    B, Lq, Lr = 8192, 128, 160
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, (B, Lr), dtype=np.uint8)
    q0 = rng.integers(0, 4, (B, Lq), dtype=np.uint8)
    ql = jnp.full(B, Lq, jnp.int32)
    rl = jnp.full(B, Lr, jnp.int32)
    refj = jnp.asarray(ref)
    qj = jnp.asarray(q0)

    def make_chain(fn, iters):
        @jax.jit
        def many(q):
            def body(i, carry):
                q, acc = carry
                s, qe, re_ = fn(q, ql, refj, rl)
                q = (q + (s[:, None] & 1).astype(jnp.uint8)) % 4
                return q, acc + s.sum().astype(jnp.int32)

            return jax.lax.fori_loop(0, iters, body, (q, jnp.int32(0)))[1]

        return many

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    kernels = [("xla_scan", _sw_align_ends_xla)]
    if jax.default_backend() == "tpu":
        kernels.insert(0, ("pallas", pallas_sw_align_ends))
    for name, fn in kernels:
        ts = {}
        for iters in (5, 55):
            m = make_chain(fn, iters)
            np.asarray(m(qj))  # compile + warm
            t0 = time.perf_counter()
            np.asarray(m(qj))
            ts[iters] = time.perf_counter() - t0
        per = (ts[55] - ts[5]) / 50
        gcups = B * Lq * Lr / per / 1e9
        print(f"SW[{name}]: {B} pairs {Lq}x{Lr}: {per*1e3:.2f} ms/call = {gcups:.1f} GCUPS")


if __name__ == "__main__":
    main()
