#!/usr/bin/env python3
"""Real-chip compile + bit-check gate for ALL Pallas kernels.

Every kernel is compiled on the actual TPU at production-tiled shapes and
its output compared bit-for-bit against the XLA twin it replaces (the
registry in ops/kernels.py is flipped between the two runs, with
jax.clear_caches() in between so the jit cache cannot return the stale
trace). Interpret-mode CI (tests/test_pallas*.py) cannot catch Mosaic
codegen/legalization failures — the round-3 `arith.maxui` regression in
pallas_join and the two documented Mosaic miscompile workarounds
(pallas_finalize.py, count.py) are exactly this failure class. Mirrors the
reference's CPU-vs-GPU cross-check discipline
(/root/reference/src/kcount/kcount_gpu.cpp:358-364).

Usage:
  verify_kernels_tpu.py             # all kernels, one subprocess each,
                                    # prints a JSON matrix on stdout
  verify_kernels_tpu.py --kernel X  # one kernel in-process (exit 0/1)

bench.py runs the matrix first and disables exactly the failed kernels, so
a Mosaic roll shows up as a named kernel failure + XLA fallback instead of
a dead bench.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

_REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, _REPO)

KERNELS = ("extract", "minimizer", "sort", "compact", "scan", "finalize",
           "join", "ssw")
# cold compiles of a check's Pallas + XLA twins take several minutes over
# the tunnel; warm (persistent cache) runs are ~30-60s each
PER_KERNEL_TIMEOUT_S = 600

# Per-kernel source files whose content determines the verdict: the Pallas
# module under test, the production call path the check drives, and the
# check code itself. A verdict is cached in CACHE_PATH keyed by the sha256
# of these files; any edit re-verifies exactly the kernels it touches
# (VERDICT r4 #2: the full matrix costs ~520 s on-chip and timed out the
# driver-run bench; an unchanged kernel's re-verification is a no-op).
_COMMON = ("mhm2_proxy_tpu/ops/kernels.py", "scripts/verify_kernels_tpu.py")
_DEPS = {
    "extract": ("mhm2_proxy_tpu/ops/count.py", "mhm2_proxy_tpu/ops/pallas_extract.py"),
    "minimizer": ("mhm2_proxy_tpu/ops/count.py", "mhm2_proxy_tpu/ops/pallas_minimizer.py",
                  "mhm2_proxy_tpu/constants.py"),
    "sort": ("mhm2_proxy_tpu/ops/count.py", "mhm2_proxy_tpu/ops/pallas_sort.py",
             "mhm2_proxy_tpu/ops/pallas_extract.py"),
    "compact": ("mhm2_proxy_tpu/ops/count.py", "mhm2_proxy_tpu/ops/pallas_compact.py",
                "mhm2_proxy_tpu/ops/pallas_extract.py", "mhm2_proxy_tpu/ops/pallas_scan.py"),
    "scan": ("mhm2_proxy_tpu/ops/count.py", "mhm2_proxy_tpu/ops/pallas_scan.py",
             "mhm2_proxy_tpu/ops/pallas_extract.py", "mhm2_proxy_tpu/ops/pallas_compact.py"),
    "finalize": ("mhm2_proxy_tpu/ops/count.py", "mhm2_proxy_tpu/ops/pallas_finalize.py",
                 "mhm2_proxy_tpu/ops/pallas_extract.py", "mhm2_proxy_tpu/ops/pallas_scan.py",
                 "mhm2_proxy_tpu/ops/pallas_compact.py"),
    "join": ("mhm2_proxy_tpu/ops/lookup.py", "mhm2_proxy_tpu/ops/pallas_join.py"),
    "ssw": ("mhm2_proxy_tpu/ops/ssw.py", "mhm2_proxy_tpu/ops/pallas_ssw.py"),
}
CACHE_PATH = os.path.join(_REPO, ".kernel_verify_cache.json")


def _source_hash(name: str) -> str:
    h = hashlib.sha256()
    for rel in _COMMON + _DEPS[name]:
        p = os.path.join(_REPO, rel)
        h.update(rel.encode())
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(b"<missing>")
    return h.hexdigest()[:24]


def _cache_load() -> dict:
    try:
        with open(CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _cache_store(cache: dict) -> None:
    try:
        with open(CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except OSError:
        pass


def _mk_blocks(B=16384, L=160, seed=0):
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = np.stack([genome[s : s + L] for s in starts])
    qual_ok = rng.random((B, L)) > 0.02
    lens = np.full((B,), L, np.int32)
    return jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens)


def _with_kernel(name: str, on: bool, fn):
    """Run fn() with kernel `name` forced on/off; fresh jit caches so the
    flip actually retraces."""
    import jax

    from mhm2_proxy_tpu.ops import kernels

    jax.clear_caches()
    kernels.force(name, on)
    try:
        return fn()
    finally:
        kernels.force(name, None)
        jax.clear_caches()


def _assert_trees_equal(a, b):
    import numpy as np

    import jax

    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb), (len(fa), len(fb))
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def check_extract():
    """Fused extraction kernels (packed + separate-payload layouts) vs the
    jnp extraction at k=21 (packed) and k=77 (sep). The sep layout's block
    sort keys only the weff key lanes (payload order within an equal-key
    run is unspecified), so compare the canonical all-lane re-sort."""
    import numpy as np

    from mhm2_proxy_tpu.ops import count as C

    cb, qb, lb = _mk_blocks()

    def canon(lanes):
        a = np.stack([np.asarray(x) for x in lanes], axis=0)
        return a[:, np.lexsort(a[::-1])]

    for k, fn in ((21, C.block_to_raw_run), (77, C.block_to_raw_run_sep)):
        got = _with_kernel("extract", True, lambda: fn(cb, qb, lb, k))
        ref = _with_kernel("extract", False, lambda: fn(cb, qb, lb, k))
        np.testing.assert_array_equal(canon(got), canon(ref))


def check_minimizer():
    from mhm2_proxy_tpu.constants import minimizer_len_for_k
    from mhm2_proxy_tpu.ops import count as C

    cb, _, _ = _mk_blocks()
    k = 21
    m = minimizer_len_for_k(k)
    got = C.minimizer_shard_targets(cb, k, m, 8, use_pallas=True)
    ref = C.minimizer_shard_targets(cb, k, m, 8, use_pallas=False)
    _assert_trees_equal(got, ref)


def check_sort():
    """Bitonic merge of two sorted raw runs vs one lax.sort of the concat,
    both the packed (kw == n_lanes) and separate-payload (kw = n-1) layouts.

    Both paths sort UNSTABLY by the kw key lanes, so the payload order
    within an equal-key run is unspecified (downstream aggregation is
    order-invariant); compare the canonical form (re-sorted by ALL lanes)."""
    import numpy as np

    from mhm2_proxy_tpu.ops import count as C

    cb, qb, lb = _mk_blocks()
    cb2, qb2, lb2 = _mk_blocks(seed=1)

    def canon(lanes):
        a = np.stack([np.asarray(x) for x in lanes], axis=0)
        return a[:, np.lexsort(a[::-1])]

    for k, fn, kw in ((21, C.block_to_raw_run, None),
                      (77, C.block_to_raw_run_sep, 5)):
        r1 = fn(cb, qb, lb, k)
        r2 = fn(cb2, qb2, lb2, k)
        got = _with_kernel("sort", True,
                           lambda: C.merge_raw_runs([tuple(r1), tuple(r2)], kw=kw))
        ref = _with_kernel("sort", False,
                           lambda: C.merge_raw_runs([tuple(r1), tuple(r2)], kw=kw))
        np.testing.assert_array_equal(canon(got), canon(ref))


def _agg_inputs():
    from mhm2_proxy_tpu.ops import count as C
    from mhm2_proxy_tpu.ops.pallas_extract import extract_record_lanes

    cb, qb, lb = _mk_blocks()
    lanes, pay = extract_record_lanes(cb, qb, lb, 21)
    flat = tuple(x.reshape(-1) for x in lanes)
    return C, flat, pay.reshape(-1)


def _split_prefixes(C, s):
    """Comparable view of a split run: only the live prefixes (tails differ
    between the sort-based and compaction-based paths by construction)."""
    import numpy as np

    n_m, n_s = int(np.asarray(s[4])), int(np.asarray(s[7]))
    return ([np.asarray(x)[:n_m] for x in s[:4]]
            + [np.asarray(x)[:n_s] for x in s[5:7]] + [n_m, n_s])


def check_scan():
    """Fused group-sums scan inside the aggregate+split path vs the XLA
    cumsum formulation (same compaction on both sides)."""
    C, flat, pay = _agg_inputs()
    got = _with_kernel("scan", True, lambda: C.aggregate_split_lanes(flat, pay))
    ref = _with_kernel("scan", False, lambda: C.aggregate_split_lanes(flat, pay))
    a, b = _split_prefixes(C, got), _split_prefixes(C, ref)
    _assert_trees_equal(a, b)


def check_compact():
    """Ragged-append compaction (and everything gated on it) vs the global
    flag-sort path."""
    C, flat, pay = _agg_inputs()
    got = _with_kernel("compact", True, lambda: C.aggregate_split_lanes(flat, pay))
    ref = _with_kernel("compact", False, lambda: C.aggregate_split_lanes(flat, pay))
    _assert_trees_equal(_split_prefixes(C, got), _split_prefixes(C, ref))


def check_finalize():
    """Fused scan+purge+compact finalize vs the unfused XLA cascade."""
    import numpy as np

    C, flat, pay = _agg_inputs()
    run = C.aggregate_split_lanes(flat, pay)
    m1 = C.merge_aggregates(*run[:4], *C.expand_singles(run[5], run[6], run[7]))

    def fin():
        return C.finalize_table(*m1, dmin_thres=2)

    got = _with_kernel("finalize", True, fin)
    ref = _with_kernel("finalize", False, fin)
    nk = int(np.asarray(got[4]))
    assert nk == int(np.asarray(ref[4])), (nk, int(np.asarray(ref[4])))
    _assert_trees_equal([np.asarray(x)[:nk] for x in got[:4]],
                        [np.asarray(x)[:nk] for x in ref[:4]])


def check_join():
    """Merge-join + fused propagation/compaction epilogue vs the concat-sort
    join, at a multi-tile merged length with duplicated queries (the round-3
    regression's exact path: build_edges -> table_join_payload)."""
    import jax.numpy as jnp
    import numpy as np

    from mhm2_proxy_tpu.ops import lookup

    rng = np.random.default_rng(2)
    T, Q = 1 << 20, (3 << 20) - (1 << 18)
    keys = np.unique(rng.integers(0, 1 << 42, 2 * T, dtype=np.uint64))[:T]
    keys.sort()
    words = np.stack([(keys >> 10).astype(np.uint32),
                      ((keys & 0x3FF) << 22).astype(np.uint32)], -1)
    n = T - 1000
    words[n:] = 0xFFFFFFFF
    payload = jnp.asarray(rng.integers(0, 64, T, dtype=np.uint32))
    # base keys WITHOUT replacement: the join's documented precondition
    # bounds rows-per-key at max_dup (default 32); 8 copies + 1 table row
    # stays well inside it (with replacement, a key drawn 5+ times exceeds
    # the bound and the two paths legitimately miss different rows)
    hit = keys[np.repeat(rng.choice(n, Q // 8, replace=False), 8)[: Q - 4096]]
    miss = rng.integers(0, 1 << 42, 4096, dtype=np.uint64)
    qk = np.concatenate([hit, miss])
    qw = jnp.asarray(np.stack([(qk >> 10).astype(np.uint32),
                               ((qk & 0x3FF) << 22).astype(np.uint32)], -1))
    words, nn = jnp.asarray(words), jnp.int32(n)

    def join():
        return lookup.table_join_payload(words, nn, qw, payload, payload_bits=6)

    try:
        lookup._USE_MERGE_JOIN = True
        got = _with_kernel("join", True, join)
        lookup._USE_MERGE_JOIN = False
        ref = _with_kernel("join", False, join)
    finally:
        lookup._USE_MERGE_JOIN = None
    f0, f1 = np.asarray(ref[1]), np.asarray(got[1])
    np.testing.assert_array_equal(f0, f1)
    np.testing.assert_array_equal(np.asarray(ref[0])[f0], np.asarray(got[0])[f1])
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))


def check_ssw():
    import jax.numpy as jnp
    import numpy as np

    from mhm2_proxy_tpu.ops import ssw

    rng = np.random.default_rng(3)
    B, Lq, Lr = 512, 256, 1024
    q = rng.integers(0, 4, (B, Lq), dtype=np.uint8)
    r = rng.integers(0, 4, (B, Lr), dtype=np.uint8)
    # half the refs contain a mutated copy of the query (real alignments)
    for i in range(0, B, 2):
        pos = rng.integers(0, Lr - Lq)
        mut = q[i].copy()
        idx = rng.random(Lq) < 0.05
        mut[idx] = (mut[idx] + 1) % 4
        r[i, pos : pos + Lq] = mut
    ql = rng.integers(Lq // 2, Lq + 1, B).astype(np.int32)
    rl = rng.integers(Lr // 2, Lr + 1, B).astype(np.int32)
    args = (jnp.asarray(q), jnp.asarray(ql), jnp.asarray(r), jnp.asarray(rl))
    got = ssw.sw_align_ends(*args, use_pallas=True)
    ref = ssw.sw_align_ends(*args, use_pallas=False)
    _assert_trees_equal(got, ref)


CHECKS = {
    "extract": check_extract,
    "minimizer": check_minimizer,
    "sort": check_sort,
    "compact": check_compact,
    "scan": check_scan,
    "finalize": check_finalize,
    "join": check_join,
    "ssw": check_ssw,
}


def run_one(name: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # a verdict is only meaningful from the real chip: Mosaic codegen is the
    # failure class under test, and interpret-mode passes can't see it
    assert jax.default_backend() == "tpu", (
        f"on-chip verify needs a TPU backend, got {jax.default_backend()}")
    CHECKS[name]()


def run_matrix(budget_s: float = 3600.0, use_cache: bool = True) -> dict:
    """Run every kernel check in its own subprocess (a Mosaic failure or a
    wedged compile must not take the matrix down). Returns
    {kernel: {"ok": bool, "s": float, "err": str?}}.

    A passing verdict is cached in CACHE_PATH keyed by the sha256 of the
    kernel's source files (_DEPS); an unchanged kernel returns its cached
    verdict in ~0 s. Failures are never cached (a toolchain roll can fix or
    break a kernel without a source change — re-check every run).
    MHM2_VERIFY_NO_CACHE=1 forces a full live matrix."""
    if os.environ.get("MHM2_VERIFY_NO_CACHE"):
        use_cache = False
    cache = _cache_load() if use_cache else {}
    results = {}
    t_start = time.monotonic()
    for name in KERNELS:
        src = _source_hash(name)
        hit = cache.get(name)
        if use_cache and hit and hit.get("hash") == src and hit.get("ok"):
            results[name] = {"ok": True, "s": 0.0, "cached": True,
                             "verified_s": hit.get("s"), "ts": hit.get("ts")}
            continue
        left = budget_s - (time.monotonic() - t_start)
        if left < 30:
            results[name] = {"ok": False, "err": "matrix budget exhausted",
                             "skipped": True}
            continue
        t0 = time.monotonic()
        timeout_s = min(PER_KERNEL_TIMEOUT_S, left)
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--kernel", name],
                timeout=timeout_s,
                capture_output=True, text=True, env=dict(os.environ),
            )
            ok = r.returncode == 0
            rec = {"ok": ok, "s": round(time.monotonic() - t0, 1)}
            if not ok:
                tail = (r.stderr or r.stdout or "").strip().splitlines()
                rec["err"] = " | ".join(tail[-3:])[-500:]
        except subprocess.TimeoutExpired:
            rec = {"ok": False, "s": round(time.monotonic() - t0, 1),
                   "err": f"timeout after {timeout_s:.0f}s"}
            if timeout_s < PER_KERNEL_TIMEOUT_S:
                # the MATRIX budget cut this check short, not a wedged
                # compile: an unfinished verdict is "not verified", not
                # "failed" — callers must leave the kernel enabled (the
                # round-5 driver bench disabled a healthy join kernel on
                # exactly this path and lost 40% of its headline)
                rec["skipped"] = True
                rec["err"] = f"matrix budget cut verify at {timeout_s:.0f}s"
        results[name] = rec
        if use_cache and rec.get("ok"):
            cache[name] = {"hash": src, "ok": True, "s": rec["s"],
                           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
            _cache_store(cache)
    return results


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--kernel":
        run_one(sys.argv[2])
        print(f"{sys.argv[2]}: OK")
        return
    results = run_matrix()
    print(json.dumps(results, indent=2))
    if not all(r.get("ok") for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
