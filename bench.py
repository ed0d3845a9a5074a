"""Benchmark: full single-chip counting round + de Bruijn edge build.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

The headline metric is k-mers/s through the COMPLETE production round on one
chip: record extraction -> per-block record sort (raw-LSM push) -> bitonic
run merges -> fused finalize (scan + extension calls + purge + compaction)
-> de Bruijn reciprocal-edge build. The headline run fences ONCE at the end
(the production flow: stages chain server-side; the only interior host sync
is the table-occupancy fetch for trim shapes); a separate per-stage-fenced
run records the stage breakdown. Fences FETCH data: under the axon TPU
tunnel jax.block_until_ready is a no-op (execution is async server-side;
only a device_get is a real barrier), and each fence costs one ~25 ms
round-trip. The steady-state microbench chains its iterations inside one
jit (data-dependent, nothing can be elided) and differences two chain
lengths to cancel the fixed overhead.

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


def fence(tree):
    """Real execution barrier: fetch one element of every array leaf.

    All fetches go through ONE jax.device_get call: the tunnel batches them
    into a single ~34 ms round-trip. Per-leaf sequential fetches cost one
    round-trip EACH and inflated every multi-output stage timing by
    n_leaves * RTT (the round-1 recorded numbers suffered this)."""
    import jax

    leaves = [x[(0,) * x.ndim] for x in jax.tree.leaves(tree) if hasattr(x, "ndim")]
    if leaves:
        jax.device_get(leaves)


def compile_service_ok(timeout_s: int = 240) -> bool:
    """Probe whether the TPU can compile a NOVEL program right now.

    The axon terminal can enter a state where previously-cached executables
    still run but fresh compiles hang forever (observed mid-round-3 after a
    server-side libtpu roll: control channel answers, remote_compile never
    returns). A hung compile inside the bench would hang the whole recording,
    so probe in a subprocess with a hard timeout and degrade gracefully."""
    import os
    import subprocess

    code = (
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache_bench')\n"
        f"y = jax.jit(lambda a: a * 3 + {int(time.time())})(jnp.zeros((16,), jnp.uint32))\n"
        "print(int(jax.device_get(y)[0]))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, env=dict(os.environ),
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


# Incrementally-updated record: the watchdog prints whatever the bench has
# measured so far instead of a zero (VERDICT r4 #2: the round-4 driver run
# timed out with parsed=null; a partial record beats none).
_PARTIAL = {
    "metric": "kmers_per_sec_full_round_per_chip",
    "value": 0,
    "unit": "kmers/s",
    "vs_baseline": 0.0,
    "detail": {},
}


def _set_value(value: float):
    _PARTIAL["value"] = round(value, 1)
    _PARTIAL["vs_baseline"] = round(value / BASELINE_KMERS_PER_SEC, 3)


def _start_watchdog(seconds: int):
    """Hard wall-time cap: if the bench wedges on a hung device fetch or a
    cold compile storm, emit the best record so far and exit hard."""
    import os
    import threading

    def fire():
        _PARTIAL["detail"]["watchdog"] = (
            f"bench watchdog fired after {seconds}s; record is partial"
        )
        print(json.dumps(_PARTIAL), flush=True)
        os._exit(0 if _PARTIAL["value"] else 3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import os
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # Hard wall-time budget (VERDICT r4 #2): the driver killed the round-4
    # bench at its own timeout with nothing printed. Everything after the
    # headline reps is optional and yields to the clock; the watchdog prints
    # the partial record if a fetch/compile wedges.
    budget_s = float(os.environ.get("MHM2_BENCH_BUDGET_S", 420))
    t_begin = time.monotonic()

    def left() -> float:
        return budget_s - (time.monotonic() - t_begin)

    watchdog = _start_watchdog(int(budget_s))
    can_compile = compile_service_ok()
    degraded = []
    from mhm2_proxy_tpu.ops import kernels
    from mhm2_proxy_tpu.ops import lookup as _lookup

    if not can_compile:
        # stick to program shapes the persistent cache already holds from the
        # last healthy round: the pre-merge-join edge build, no multi-k
        _lookup._USE_MERGE_JOIN = False
        degraded.append("compile service down: merge-join off, multi-k skipped")

    # real-chip kernel gate (VERDICT r3 #3): compile + bit-check every Pallas
    # kernel against its XLA twin on the actual chip BEFORE timing anything;
    # a Mosaic roll shows up as a named kernel failure + XLA fallback instead
    # of a dead bench (the round-3 failure mode: arith.maxui in pallas_join
    # killed the whole recording).
    kernel_matrix = None
    if (can_compile and jax.default_backend() == "tpu"
            and not os.environ.get("MHM2_BENCH_SKIP_GATE")):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts"))
        import verify_kernels_tpu

        # cached verdicts (source-hash keyed) make an unchanged kernel ~0 s;
        # only edited kernels spend the budget. Reserve ~180 s for the timed
        # rounds themselves.
        kernel_matrix = verify_kernels_tpu.run_matrix(
            budget_s=max(60.0, left() - 180.0))
        # a kernel the gate SKIPPED (budget) is not known-bad: leave it on
        # and let run_round_safe catch a genuine failure
        for kname, r in list(kernel_matrix.items()):
            if r.get("skipped"):
                kernel_matrix[kname] = {**r, "ok": None}
        for kname, r in kernel_matrix.items():
            if r.get("ok") is False:
                kernels.disable(kname, r.get("err", "verify failed"))
                degraded.append(
                    f"kernel {kname} failed on-chip verify -> XLA fallback"
                )
    import jax.numpy as jnp
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.dbjg.traverse import build_edges, fit_table_rows
    from mhm2_proxy_tpu.ops import count as C
    from mhm2_proxy_tpu.constants import minimizer_len_for_k

    import os

    k = 21
    m = minimizer_len_for_k(k)
    # production auto block size on TPU (models.assembler.resolve_block_reads);
    # MHM2_BENCH_B overrides for logic smoke tests on CPU
    B, L = int(os.environ.get("MHM2_BENCH_B", 131072)), 160
    n_blocks = 2
    rng = np.random.default_rng(0)
    # reads drawn from a synthetic genome so duplicate kmers exist
    genome = rng.integers(0, 4, 8_000_000, dtype=np.uint8)
    blocks = []
    for _ in range(n_blocks):
        starts = rng.integers(0, len(genome) - L, B)
        codes = np.stack([genome[s : s + L] for s in starts])
        qual_ok = rng.random((B, L)) > 0.02
        lens = np.full((B,), L, np.int32)
        blocks.append((jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens)))
    fence(blocks)
    kmers_total = n_blocks * B * (L - k - 1)

    def run_round(staged: bool):
        """One full round. staged=True fences every stage (per-stage times,
        ~3 tunnel RTTs of overhead); staged=False fences ONCE at the end —
        the production flow, where stages chain server-side and the only
        interior host sync is the table-occupancy fetch fit_table_rows
        needs for its trim shapes."""
        times = {}
        store = KmerCountStore(k)
        t0 = time.perf_counter()
        for cb, qb, lb in blocks:
            store.add_reads_block(cb, qb, lb)
        if staged:
            fence(store.raw_runs or store.runs)
        t1 = time.perf_counter()
        table = store.finalize()
        if staged:
            fence((table.words, table.count))
        t2 = time.perf_counter()
        tbl = fit_table_rows(table)
        edges = build_edges(tbl.words, tbl.count, tbl.left, tbl.right, tbl.n, k)
        fence(edges)
        t3 = time.perf_counter()
        times["count_aggregate_s"] = t1 - t0
        times["finalize_s"] = t2 - t1
        times["build_edges_s"] = t3 - t2
        times["total_s"] = t3 - t0
        return table, times

    def run_round_safe(staged: bool):
        """run_round that degrades instead of dying: on any failure (a
        Mosaic rejection the gate's shapes missed, a fresh toolchain roll)
        disable ALL Pallas kernels + the merge join, clear the jit caches so
        the flip actually retraces, and re-run pure-XLA."""
        nonlocal pure_xla
        if pure_xla:
            return run_round(staged)
        try:
            return run_round(staged)
        except Exception as e:
            pure_xla = True
            degraded.append(
                f"round raised {type(e).__name__} -> all kernels disabled, "
                f"pure-XLA rerun: {str(e)[:300]}"
            )
            for kname in kernels._MODULES:
                kernels.disable(kname, "bench fallback")
            _lookup._USE_MERGE_JOIN = False
            jax.clear_caches()
            return run_round(staged)

    pure_xla = False
    detail = _PARTIAL["detail"]
    detail["platform"] = jax.devices()[0].platform
    detail["k"] = k
    detail["kmers_per_round"] = kmers_total
    if kernel_matrix is not None:
        detail["kernel_verify"] = kernel_matrix
    # warmup compiles every shape of the identical timed pass
    table, warm_times = run_round_safe(staged=True)
    detail["staged_breakdown"] = {kk: round(v, 4) for kk, v in warm_times.items()}
    detail["table_kmers"] = int(np.asarray(table.n))
    reps = []
    for _ in range(3):
        table, times = run_round_safe(staged=False)
        reps.append(times)
        best = min(reps, key=lambda t: t["total_s"])
        _set_value(kmers_total / best["total_s"])
        detail["total_s"] = round(best["total_s"], 4)
        detail["round_total_s_all_reps"] = [round(t["total_s"], 4) for t in reps]
    staged_reps = [warm_times]
    for _ in range(2):
        if left() < 60:
            break
        table, times = run_round_safe(staged=True)
        staged_reps.append(times)
    best = min(reps, key=lambda t: t["total_s"])
    best_staged = min(staged_reps, key=lambda t: t["total_s"])
    detail["staged_breakdown"] = {kk: round(v, 4) for kk, v in best_staged.items()}
    value = kmers_total / best["total_s"]

    # steady-state aggregate-only microbench (round-1 continuity metric):
    # iterations chained by data dependence inside one jit; two chain lengths
    # difference away compile/dispatch/RTT overhead
    def agg_chain(iters):
        @jax.jit
        def many(codes, qual_ok, lens):
            def body(i, carry):
                codes, acc = carry
                rec = C.read_kmer_records(codes, qual_ok, lens, k, m, n_shards=8)
                agg = C.aggregate_records(
                    rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"]
                )
                bump = (agg[0][0, 0] & jnp.uint32(3)).astype(jnp.uint8)
                codes = jnp.where(codes < 4, (codes + bump) % 4, codes)
                return codes, acc + agg[4].astype(jnp.int64)

            return jax.lax.fori_loop(0, iters, body, (codes, jnp.int64(0)))[1]

        return many

    cb, qb, lb = blocks[0]
    micro = []
    try:
        for _ in range(5):
            if left() < 90:
                degraded.append("microbench truncated: bench budget")
                break
            ts = {}
            for iters in (2, 12):
                mfn = agg_chain(iters)
                np.asarray(mfn(cb, qb, lb))  # compile + warm
                t_min = 1e18
                for _ in range(2):
                    t0 = time.perf_counter()
                    np.asarray(mfn(cb, qb, lb))
                    t_min = min(t_min, time.perf_counter() - t0)
                ts[iters] = t_min
            per = (ts[12] - ts[2]) / 10
            if per > 0:  # guard tunnel-jitter-induced negative differences
                micro.append(B * (L - k - 1) / per)
    except Exception as e:
        degraded.append(f"aggregate-only microbench failed: {type(e).__name__}")
    if not micro:
        micro = [0.0]
    detail["aggregate_only_kmers_per_sec"] = round(statistics.median(micro), 1)

    # multi-k on-chip rounds (VERDICT r2 #6): the production run is 21->99
    # with W=4/6/8 word paths; record one single-block round per k so every
    # word path has a real-chip number. Warmup + best-of-2 per k.
    multi_k = {}
    detail["multi_k_single_block"] = multi_k
    cb0, qb0, lb0 = blocks[0]
    for kx in (21, 33, 55, 77, 99) if can_compile else ():
        if left() < 60:
            degraded.append(f"multi-k truncated at k={kx}: bench budget")
            break
        kmers_kx = B * (L - kx - 1)

        def round_k():
            st = KmerCountStore(kx)
            t0 = time.perf_counter()
            st.add_reads_block(cb0, qb0, lb0)
            tab = st.finalize()
            fence((tab.words, tab.count))
            t1 = time.perf_counter()
            tb = fit_table_rows(tab)
            e = build_edges(tb.words, tb.count, tb.left, tb.right, tb.n, kx)
            fence(e)
            return t1 - t0, time.perf_counter() - t0, tab

        try:
            round_k()  # compile warm
            best_k = min((round_k() for _ in range(2)), key=lambda r: r[1])
            multi_k[kx] = {
                "count_finalize_s": round(best_k[0], 4),
                "round_s": round(best_k[1], 4),
                "kmers_per_sec": round(kmers_kx / best_k[1], 1),
                "table_kmers": int(np.asarray(best_k[2].n)),
            }
        except Exception as e:
            multi_k[kx] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            degraded.append(f"multi-k k={kx} round failed")

    detail["table_kmers"] = int(np.asarray(table.n))
    detail["aggregate_only_spread"] = [round(min(micro), 1), round(max(micro), 1)]
    detail["fencing"] = (
        "headline: ONE device_get at round end (production flow; stages "
        "chain server-side); staged_breakdown from a separate per-stage-"
        "fenced run (block_until_ready is a no-op via tunnel)"
    )
    detail["bench_wall_s"] = round(time.monotonic() - t_begin, 1)
    if degraded:
        detail["degraded"] = degraded
    _set_value(value)
    watchdog.cancel()
    print(json.dumps(_PARTIAL))


if __name__ == "__main__":
    main()
