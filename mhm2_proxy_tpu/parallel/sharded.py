"""Multi-device sharded counting and lookup over a jax.sharding.Mesh.

The reference's RPC-everywhere PGAS flow (ThreeTierAggrStore all-to-all of
supermers, upcxx-utils/include/.../three_tier_aggr_store.hpp:289-316, routed
by minimizer hash, kmer_dht.cpp:193-196) becomes a bulk-synchronous exchange:

  per-device read block -> k-mer records -> bucketize by target shard
  (fixed-capacity buckets with drop accounting, mirroring the reference's
  dropped-kmer stats kcount_cpu.cpp:265-267) -> jax.lax.all_to_all over the
  'shards' mesh axis (ICI collective) -> per-shard sort+reduce aggregation.

Traversal lookups use the same routing in reverse: each shard's neighbor
queries are bucketized by owner shard, exchanged, answered against the local
sorted table, and returned by a second all_to_all.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import MAX_KMER_COUNT, minimizer_len_for_k, words32_for_k
from ..ops import count as C
from ..ops import bitkmer as bk
from ..kcount.kmer_store import (
    FinalTable,
    _aggregate_ctg_records,
    _merge_ctg_aggregates,
    _apply_ctg_rules,
)
from ..ops.lookup import table_lookup
from ..ops.supermer import build_supermers, expand_supermers, supermer_layout

I32 = jnp.int32
I64 = jnp.int64
U32 = jnp.uint32


def make_shard_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), ("shards",), devices=devs[:n])


def device_get_global(x) -> np.ndarray:
    """Fetch a (possibly multi-process) global array to host, fully.

    Single-process: plain device_get. Multi-process: per-process shards are
    all-gathered so every host sees the full array (the host-side stitch and
    table dumps need global views; reference rget-based gathers,
    dbjg_traversal.cpp:392-430)."""
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def put_sharded(arr, sharding) -> jax.Array:
    """Place host data onto a (possibly multi-process) sharding.

    Single-process: device_put of the full array. Multi-process: `arr` is
    each process's LOCAL rows (equal count per process); the global array is
    assembled across processes (per-host byte-range ingest means no process
    ever holds the whole input, fastq.cpp:399-455)."""
    arr = np.asarray(arr)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), sharding)
    gshape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
    return jax.make_array_from_process_local_data(sharding, arr, gshape)


def _bucketize(payload, target, valid, n_shards: int, cap: int):
    """Route rows into (n_shards, cap, R) fixed-capacity buckets.

    Rows beyond a bucket's capacity are NOT lost: they are returned as a
    leftover set (payload, target, mask) for the caller to re-exchange in a
    spill round — the reference's aggregating stores likewise never drop,
    they backpressure (flat_aggr_store.hpp:41-72).

    Returns (buckets, n_overflow, (leftover_payload, leftover_target,
    leftover_mask)).
    """
    N, R = payload.shape
    key = jnp.where(valid, target, n_shards)
    order = jnp.argsort(key, stable=True)
    p_s = payload[order]
    t_s = key[order]
    start = jnp.searchsorted(t_s, jnp.arange(n_shards + 1, dtype=t_s.dtype))
    pos = jnp.arange(N, dtype=I32) - start[jnp.clip(t_s, 0, n_shards - 1)].astype(I32)
    ok = (t_s < n_shards) & (pos < cap)
    dest = jnp.where(ok, t_s.astype(I32) * cap + pos, n_shards * cap)
    out = jnp.zeros((n_shards * cap + 1, R), payload.dtype)
    out = out.at[dest].set(p_s, mode="drop")
    left_mask = (t_s < n_shards) & (pos >= cap)
    left_target = jnp.where(left_mask, t_s, n_shards).astype(I32)
    n_overflow = jnp.sum(left_mask)
    return (
        out[: n_shards * cap].reshape(n_shards, cap, R),
        n_overflow,
        (p_s, left_target, left_mask),
    )


def _presum_duplicates(payload, target, valid, count_of, with_count, mode: str):
    """Sender-side pre-aggregation of duplicate rows before the exchange.

    The analog of the reference's HeavyHitterStreamingStore
    (heavy_hitter_streaming_store.hpp:243-265): identical payload rows
    (ignoring the count field) are collapsed to one row whose count is the
    saturating sum ('sum', read pass — exact w.r.t. the u16-clamped table
    counts since increments are nonnegative) or the min ('min', ctg pass —
    matching the min-depth-over-occurrences rule, kcount_cpu.cpp:381-396).
    A poly-A storm thus collapses to ~1 row per sender instead of flooding
    one shard's buckets.

    count_of(payload) -> (N,) i32; with_count(payload, c) -> payload.
    Returns (payload, target, valid, n_collapsed).
    """
    N, R = payload.shape
    cnt = count_of(payload).astype(I32)
    key_rows = with_count(payload, jnp.zeros((N,), I32))
    vkey = jnp.where(valid, U32(0), U32(1))
    # stable variadic sort carrying (count, target) through the sort network:
    # gather-free (XLA:TPU gathers at dynamic indices cost ~8x sort lanes)
    out = jax.lax.sort(
        (vkey,) + tuple(key_rows[:, i] for i in range(R)) + (cnt, target),
        num_keys=R + 1, is_stable=True,
    )
    sv = out[0] == 0
    kp = jnp.stack(out[1 : 1 + R], axis=-1)
    c = out[1 + R]
    t = out[2 + R]
    neq = jnp.any(kp[1:] != kp[:-1], axis=-1) | (sv[1:] != sv[:-1])
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_last = jnp.concatenate([neq, jnp.ones((1,), bool)])
    if mode == "sum":
        # scan-based segmented sum (scatter-free): exclusive prefix at the
        # group start rides forward on a cummax (prefixes nondecreasing for
        # nonnegative counts; exact in int32 since counts sum to the batch's
        # k-mer instance total < 2^31)
        cs = jnp.cumsum(c, dtype=I32)
        start_excl = jax.lax.cummax(jnp.where(is_start, cs - c, 0))
        red = jnp.minimum(cs - start_excl, MAX_KMER_COUNT)
    else:
        # segmented min via log-doubling over the group-id lane
        gid = jnp.cumsum(is_start.astype(I32))
        red = c
        d = 1
        while d < N:
            same = gid[d:] == gid[:-d]
            cand = jnp.concatenate([red[:d], jnp.where(same, red[:-d], red[d:])])
            red = jnp.minimum(red, cand)
            d *= 2
    # the group representative is its LAST row (where the scans land)
    v2 = sv & is_last
    p2 = with_count(kp, red)
    return p2, t, v2, jnp.sum(valid) - jnp.sum(v2)


def _record_fns(k: int, m: int, smax: int, n_route: int, use_supermers: bool, ctg_mode: bool):
    """Build the record-format closures shared by the flat and hierarchical
    counters.

    Returns (make_records, receive_agg, count_of, with_count, R):
      make_records(codes, qual_ok, lens, depth) -> (payload (N,R) u32,
        target (N,) i32 in [0, n_route), valid (N,) bool, n_kmers scalar)
      receive_agg(payload (M,R)) -> partial-table aggregate tuple
      count_of/with_count: count-field accessors for _presum_duplicates;
        with_count preserves all non-count payload bits (the hierarchical
        path stashes the target host in spare meta bits).
    """
    if use_supermers:
        nb, cw, mw, rw = supermer_layout(k, smax)
        R = rw
        meta_col = cw + mw

        def count_of(pl):
            return ((pl[:, meta_col] >> U32(8)) & U32(0xFFFF)).astype(I32)

        def with_count(pl, c):
            meta = (pl[:, meta_col] & ~U32(0xFFFF << 8)) | (
                jnp.clip(c, 0, MAX_KMER_COUNT).astype(U32) << U32(8)
            )
            return jnp.concatenate([pl[:, :meta_col], meta[:, None]], axis=1)

        def make_records(codes, qual_ok, lens, depth):
            sup = build_supermers(codes, qual_ok, lens, k, m, smax, n_route, depth=depth)
            return sup["records"], sup["target"], sup["valid"], sup["n_kmers"]

        def receive_agg(recs):
            s_codes, s_qok, s_lens, s_depth = expand_supermers(recs, k, smax)
            rec = C.read_kmer_records(s_codes, s_qok, s_lens, k, m, n_shards=1, depth=s_depth)
            if ctg_mode:
                return _aggregate_ctg_records(
                    rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"]
                )
            return C.aggregate_records(
                rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"]
            )
    else:
        W = words32_for_k(k)
        R = W + 2

        def count_of(pl):
            return pl[:, W + 1].astype(I32)

        def with_count(pl, c):
            return jnp.concatenate(
                [pl[:, : W + 1], jnp.clip(c, 0, MAX_KMER_COUNT).astype(U32)[:, None]], axis=1
            )

        def make_records(codes, qual_ok, lens, depth):
            rec = C.read_kmer_records(codes, qual_ok, lens, k, m, n_shards=n_route, depth=depth)
            return _pack_records(rec), rec["target"], rec["valid"], jnp.sum(rec["valid"])

        def receive_agg(pl):
            words, left, right, count, valid = _unpack_records(pl, W)
            if ctg_mode:
                return _aggregate_ctg_records(words, left, right, count, valid)
            return C.aggregate_records(words, left, right, count, valid)

    return make_records, receive_agg, count_of, with_count, R


def _pack_records(rec):
    """Pack count records into a single (N, W+2) uint32 payload."""
    words = rec["words"]
    meta = (
        rec["left"].astype(U32)
        | (rec["right"].astype(U32) << U32(8))
        | (rec["valid"].astype(U32) << U32(16))
    )
    cnt = rec["count"].astype(U32)
    return jnp.concatenate([words, meta[:, None], cnt[:, None]], axis=1)


def _unpack_records(payload, W):
    words = payload[:, :W]
    meta = payload[:, W]
    left = (meta & U32(0xFF)).astype(jnp.uint8)
    right = ((meta >> U32(8)) & U32(0xFF)).astype(jnp.uint8)
    valid = ((meta >> U32(16)) & U32(1)).astype(bool)
    count = payload[:, W + 1].astype(I32)
    return words, left, right, count, valid


class ShardedCounter:
    """Distributed k-mer counting over a 1-D device mesh.

    Equivalent to one KmerCountStore per shard with minimizer-hash routing;
    all arrays carry a leading shard axis sharded over the mesh.
    """

    def __init__(self, k: int, mesh: Mesh, dmin_thres: int = 2, bucket_cap: int | None = None,
                 use_supermers: bool = False, smax: int = 24,
                 compact_singles: bool = True):
        # use_supermers trades ~2.4x extra compute (window packing + receiver
        # re-derivation, measured at fixed volume on an 8-way mesh) for the
        # reference's ~k/smax exchange-bandwidth reduction
        # (kcount_cpu.cpp:84-103). Default OFF for single-host ICI meshes
        # where compute, not interconnect, is the bottleneck; the multi-host
        # HierarchicalCounter keeps it ON for the DCN hop.
        self.compact_singles = compact_singles
        self.use_supermers = use_supermers
        self.smax = smax
        self.k = k
        self.m = minimizer_len_for_k(k)
        self.mesh = mesh
        self.S = mesh.devices.size
        self.dmin_thres = dmin_thres
        self.bucket_cap = bucket_cap
        self.runs: list[tuple] = []
        self.ctg_runs: list[tuple] = []
        # exchange observability (reference kcount_cpu.cpp:107-110 compression
        # ratio, flat_aggr_store per-target volume counters)
        self.dropped = 0  # permanently lost rows: structurally 0 (spill loop)
        self.spilled = 0  # rows deferred to spill rounds (re-sent, not lost)
        self.spill_rounds = 0
        self.stat_kmers = 0
        self.stat_records = 0
        self.stat_bytes = 0
        self.stat_collapsed = 0
        if use_supermers:
            self._row_words = supermer_layout(k, smax)[3]
        else:
            self._row_words = words32_for_k(k) + 2
        self._count_steps = {}
        self._agg = jax.jit(jax.vmap(C.aggregate_records))
        self._merge = jax.jit(jax.vmap(C.merge_aggregates))
        self._finalize = jax.jit(
            jax.vmap(partial(C.finalize_table, dmin_thres=dmin_thres))
        )
        self._merge_ctg = jax.jit(jax.vmap(_merge_ctg_aggregates))
        self._split = jax.jit(jax.vmap(C.split_run))
        self._expand_singles = jax.jit(jax.vmap(C.expand_singles))
        self._merge4 = jax.jit(jax.vmap(C.merge_aggregates4))
        self._apply_ctg = jax.jit(
            jax.vmap(partial(_apply_ctg_rules, dmin_thres=dmin_thres))
        )

    def _build_count_step(self, B, L, cap, ctg_mode: bool):
        """Build the (first_step, spill_step) jitted pair for one shape config.

        first_step: records -> sender presum -> bucketize -> all_to_all ->
        receiver aggregate, returning leftovers (rows that overflowed a
        bucket) for spill rounds. spill_step re-exchanges leftovers with the
        same capacity until none remain — together the exchange is lossless
        under arbitrary minimizer-hash skew (reference flat_aggr_store
        backpressure semantics, flat_aggr_store.hpp:41-72).
        """
        k, m, S = self.k, self.m, self.S
        mesh = self.mesh
        mode = "min" if ctg_mode else "sum"
        make_records, receive_agg, count_of, with_count, R = _record_fns(
            k, m, self.smax, S, self.use_supermers, ctg_mode
        )

        def exchange(payload, target, valid):
            buckets, n_over, (lp, lt, lv) = _bucketize(payload, target, valid, S, cap)
            recv = jax.lax.all_to_all(
                buckets, "shards", split_axis=0, concat_axis=0, tiled=True
            )
            n_sent = jnp.sum(valid) - n_over
            return recv.reshape(S * cap, R), lp, lt, lv, n_sent, n_over

        # receiver aggregation (and the singleton split on the read pass)
        # runs INSIDE the same shard_map: per-device local compute (each
        # output leaf gets a leading length-1 device dim that concatenates to
        # the (S, ...) layout the LSM expects). This keeps the whole push one
        # jit region — over a remote-tunnel TPU every extra dispatch or
        # host-sync is a ~30 ms round-trip — and avoids explicit-sharding
        # spec inference on the recv payloads (a 1-shard mesh used to
        # misplace the 'shards' axis through the reshape boundary).
        do_split = self.compact_singles and not ctg_mode
        n_agg = 8 if do_split else 5

        def finish(recv):
            agg = receive_agg(recv)
            if do_split:
                agg = C.split_run(*agg)
            return agg

        def per_device_first(codes, qual_ok, lens, depth):
            payload, target, valid, n_kmers = make_records(codes, qual_ok, lens, depth)
            payload, target, valid, n_collapsed = _presum_duplicates(
                payload, target, valid, count_of, with_count, mode
            )
            recv, lp, lt, lv, n_sent, n_over = exchange(payload, target, valid)
            agg = finish(recv)
            stats = jnp.stack(
                [n_kmers.astype(I64), n_sent.astype(I64), n_over.astype(I64),
                 n_collapsed.astype(I64)]
            )
            return tuple(x[None] for x in agg), lp, lt, lv, stats[None]

        def per_device_spill(payload, target, valid):
            recv, lp, lt, lv, n_sent, n_over = exchange(payload, target, valid)
            agg = finish(recv)
            stats = jnp.stack(
                [jnp.zeros((), I64), n_sent.astype(I64), n_over.astype(I64),
                 jnp.zeros((), I64)]
            )
            return tuple(x[None] for x in agg), lp, lt, lv, stats[None]

        agg_specs = (P("shards"),) * n_agg
        first_fn = jax.shard_map(
            per_device_first, mesh=mesh,
            in_specs=(P("shards"),) * 4,
            out_specs=(agg_specs,) + (P("shards"),) * 4,
            check_vma=False,
        )
        spill_fn = jax.shard_map(
            per_device_spill, mesh=mesh,
            in_specs=(P("shards"),) * 3,
            out_specs=(agg_specs,) + (P("shards"),) * 4,
            check_vma=False,
        )

        def counters_of(agg, stats):
            # one fetched vector carries exchange stats + trim occupancies
            c = jnp.sum(stats, axis=0)
            if do_split:
                c = jnp.concatenate(
                    [c, jnp.stack([jnp.max(agg[4]).astype(I64), jnp.max(agg[7]).astype(I64)])]
                )
            return c

        @jax.jit
        def first_step(codes, qual_ok, lens, depth):
            agg, lp, lt, lv, stats = first_fn(codes, qual_ok, lens, depth)
            return agg, lp, lt, lv, counters_of(agg, stats)

        @jax.jit
        def spill_step(payload, target, valid):
            agg, lp, lt, lv, stats = spill_fn(payload, target, valid)
            return agg, lp, lt, lv, counters_of(agg, stats)

        return first_step, spill_step

    def add_reads_block(self, codes, qual_ok, lens):
        """codes: (S*B, L) global arrays sharded over devices on axis 0."""
        self._add_block(codes, qual_ok, lens, None)

    def add_ctgs_block(self, codes, lens, depths):
        """Contig-kmer pass with per-contig depth (reference kcount.cpp:100-138)."""
        qual_ok = np.ones(np.asarray(codes).shape, bool)
        self._add_block(codes, qual_ok, lens, np.asarray(depths, np.int32))

    def _add_block(self, codes, qual_ok, lens, depths):
        ctg_mode = depths is not None
        SB, L = np.asarray(codes).shape
        B = SB // self.S
        P_ = L - self.k + 1
        # bucket_cap is in KMERS; the supermer path converts to records.
        # Undersized caps cost spill rounds, never correctness.
        if self.bucket_cap:
            kmer_cap = self.bucket_cap
            floor = 8
        else:
            kmer_cap = max(256, int(B * P_ // max(self.S, 1) * 2))
            floor = 64
        if self.use_supermers:
            cap = max(floor, kmer_cap // self.smax * 3)
        else:
            cap = kmer_cap
        key = (B, L, cap, ctg_mode)
        steps = self._count_steps
        if key not in steps:
            steps[key] = self._build_count_step(B, L, cap, ctg_mode)
        first_step, spill_step = steps[key]
        sharding = NamedSharding(self.mesh, P("shards"))
        codes = put_sharded(codes, sharding)
        qual_ok = put_sharded(qual_ok, sharding)
        lens = put_sharded(lens, sharding)
        if depths is None:
            depths = np.ones((SB,), np.int32)  # read pass: each record counts once
        depths = put_sharded(depths, sharding)
        with jax.set_mesh(self.mesh):
            agg, lp, lt, lv, counters = first_step(codes, qual_ok, lens, depths)
            n_left = self._push_counted(agg, counters, ctg_mode)
            # spill rounds: re-exchange overflowed rows until all are placed
            # (lossless under arbitrary skew; terminates since every round
            # ships cap rows per over-full destination)
            while n_left > 0:
                self.spill_rounds += 1
                agg, lp, lt, lv, counters = spill_step(lp, lt, lv)
                n_left = self._push_counted(agg, counters, ctg_mode)

    def _push_counted(self, agg, counters, ctg_mode: bool) -> int:
        """Push one exchanged aggregate; ONE host fetch covers the exchange
        stats and (read pass) the trim occupancies."""
        c = np.asarray(jax.device_get(counters))
        if ctg_mode:
            self._push_ctg_run(agg)
        elif self.compact_singles:
            self._push_split(self._trim_split(agg, int(c[4]), int(c[5])))
        else:
            self._push_plain(agg)
        return self._account(c[:4])

    def _account(self, stats) -> int:
        n_kmers, n_sent, n_over, n_collapsed = (int(x) for x in np.asarray(stats))
        self.stat_kmers += n_kmers
        self.stat_records += n_sent
        self.stat_bytes += n_sent * self._row_words * 4
        self.stat_collapsed += n_collapsed
        self.spilled += n_over
        return n_over

    def describe_exchange(self) -> str:
        """Exchange-volume summary (reference supermer compression ratio,
        kcount_cpu.cpp:107-110, and aggr-store volume counters)."""
        ratio = self.stat_kmers / max(self.stat_records, 1)
        return (
            f"{self.stat_records} records ({self.stat_bytes >> 20} MiB all_to_all) "
            f"for {self.stat_kmers} kmers ({ratio:.1f} kmers/record), "
            f"{self.stat_collapsed} presummed, {self.spilled} re-sent in "
            f"{self.spill_rounds} spill rounds, {self.dropped} dropped"
        )

    # -- read-pass LSM with the singleton pre-filter (GQF analog) ----------
    # Runs are stored split: multi part (count >= 2, full format) + compact
    # singleton part (~4x smaller rows), trimmed to occupancy after every
    # merge (reference kcount-gpu/gqf.hpp:358-378, sizing kmer_dht.cpp:151).

    @staticmethod
    def _trim_split(run, n_m: int, n_s: int):
        """Trim a split (S, T, ...) run to pow2 occupancy along axis 1."""
        m_w, m_c, m_l4, m_r4, nm, s_w, s_e, ns = run
        pm = min(C.pow2_rows(n_m), m_w.shape[1])
        ps = min(C.pow2_rows(n_s), s_w.shape[1])
        return (m_w[:, :pm], m_c[:, :pm], m_l4[:, :pm], m_r4[:, :pm], nm,
                s_w[:, :ps], s_e[:, :ps], ns)

    def _split_trim(self, agg):
        run = self._split(*agg)
        ns = np.asarray(jax.device_get(jnp.stack([jnp.max(run[4]), jnp.max(run[7])])))
        return self._trim_split(run, int(ns[0]), int(ns[1]))

    def _merge_split(self, a, b):
        merged = self._merge4(
            a[:4], self._expand_singles(a[5], a[6], a[7]),
            b[:4], self._expand_singles(b[5], b[6], b[7]),
        )
        return self._split_trim(merged)

    @staticmethod
    def _split_rows(run) -> int:
        return run[0].shape[1] + run[5].shape[1]

    def resident_run_bytes(self) -> int:
        return sum(sum(x.nbytes for x in run if hasattr(x, "nbytes")) for run in self.runs)

    def _push_plain(self, agg):
        self.runs.append(agg)
        while len(self.runs) >= 2 and self.runs[-1][0].shape[1] >= self.runs[-2][0].shape[1] // 2:
            b = self.runs.pop()
            a = self.runs.pop()
            self.runs.append(self._merge(*a[:4], *b[:4]))

    def _push_split(self, run):
        """Push an already-split, already-trimmed 8-tuple run."""
        self.runs.append(run)
        while (
            len(self.runs) >= 2
            and self._split_rows(self.runs[-1]) >= self._split_rows(self.runs[-2]) // 2
        ):
            b = self.runs.pop()
            a = self.runs.pop()
            self.runs.append(self._merge_split(a, b))

    def _push_ctg_run(self, agg):
        self.ctg_runs.append(agg)
        while len(self.ctg_runs) >= 2 and self.ctg_runs[-1][0].shape[1] >= self.ctg_runs[-2][0].shape[1] // 2:
            b = self.ctg_runs.pop()
            a = self.ctg_runs.pop()
            self.ctg_runs.append(self._merge_ctg(*a[:4], *b[:4]))

    def finalize(self) -> "ShardedTable":
        with jax.set_mesh(self.mesh):
            return self._finalize_in_mesh()

    def _finalize_in_mesh(self):
        while len(self.runs) > 1:
            b = self.runs.pop()
            a = self.runs.pop()
            if self.compact_singles:
                self.runs.append(self._merge_split(a, b))
            else:
                self.runs.append(self._merge(*a[:4], *b[:4]))
        if self.runs and self.compact_singles:
            # fold the singleton sideband back into full format for finalize
            a = self.runs[0]
            self.runs[0] = self._merge(*a[:4], *self._expand_singles(a[5], a[6], a[7]))
        if not self.runs:
            W = words32_for_k(self.k)
            z = jnp.full((self.S, 1, W), 0xFFFFFFFF, U32)
            self.runs.append(
                (z, jnp.zeros((self.S, 1), I32), jnp.zeros((self.S, 1, 4), I32),
                 jnp.zeros((self.S, 1, 4), I32), jnp.zeros((self.S,), I32))
            )
        merged = self.runs[0]
        while len(self.ctg_runs) > 1:
            b = self.ctg_runs.pop()
            a = self.ctg_runs.pop()
            self.ctg_runs.append(self._merge_ctg(*a[:4], *b[:4]))
        if self.ctg_runs:
            merged = self._apply_ctg(*merged, *self.ctg_runs[0])
        words, cnt, left, right, n = self._finalize(*merged)
        return ShardedTable(self.k, words, cnt, left, right, n, self.mesh)


class ShardedTable:
    """Per-shard finalized tables with a cross-shard lookup collective."""

    def __init__(self, k, words, count, left, right, n, mesh):
        self.k = k
        self.words = words  # (S, T, W)
        self.count = count
        self.left = left
        self.right = right
        self.n = n  # (S,)
        self.mesh = mesh
        self.S = words.shape[0]

    def shard_tables(self) -> list[FinalTable]:
        w = device_get_global(self.words)
        c = device_get_global(self.count)
        l = device_get_global(self.left)
        r = device_get_global(self.right)
        n = device_get_global(self.n)
        return [
            FinalTable(self.k, w[s], c[s], l[s], r[s], n[s]) for s in range(self.S)
        ]


def sharded_lookup(table: ShardedTable, query_words, query_valid, cap: int | None = None):
    """Cross-shard batched point lookup (lossless).

    query_words: (S, Q, W) per-source-shard canonical k-mer queries with
    query_valid: (S, Q) bool. Returns (found, count, left, right), each
    (S, Q), aligned with the queries. If minimizer-hash skew overflows a
    bucket, the lookup retries with doubled capacity until every query is
    answered (the reference's aggregating stores never drop either,
    flat_aggr_store.hpp:41-72).
    """
    S, Q, W = query_words.shape
    max_cap = S * Q  # every query routed to one shard
    while True:
        try:
            return _sharded_lookup_once(table, query_words, query_valid, cap)
        except _BucketOverflow as e:
            if e.cap >= max_cap:
                raise RuntimeError("sharded_lookup: overflow at max capacity") from e
            cap = min(2 * e.cap, max_cap)


class _BucketOverflow(Exception):
    def __init__(self, cap: int, dropped: int):
        super().__init__(f"{dropped} rows overflowed bucket cap {cap}")
        self.cap = cap
        self.dropped = dropped


def _sharded_lookup_once(table: ShardedTable, query_words, query_valid, cap: int | None = None):
    S, Q, W = query_words.shape
    k, m = table.k, minimizer_len_for_k(table.k)
    cap = cap or max(64, 2 * Q // max(S, 1) + 64)
    mesh = table.mesh
    # works over any mesh: a multi-axis ("dcn", "ici") mesh flattens to one
    # combined host-major axis for this collective
    axes = tuple(mesh.axis_names)
    axis = axes if len(axes) > 1 else axes[0]
    spec = P(axes)

    def per_device(qw, q_valid, t_words, t_count, t_left, t_right, t_n):
        qw, q_valid = qw[0], q_valid[0]  # (Q, W), (Q,)
        t_words, t_count = t_words[0], t_count[0]
        t_left, t_right, t_n = t_left[0], t_right[0], t_n[0]
        minz = bk.minimizers_from_words(qw, k, m)
        target = (bk.quick_hash_u64(minz) % jnp.uint64(S)).astype(I32)
        qid = jax.lax.broadcasted_iota(I32, (Q, 1), 0)[:, 0]
        # payload: words, qid, request-valid flag
        payload = jnp.concatenate(
            [qw, qid[:, None].astype(U32), q_valid[:, None].astype(U32)], axis=1
        )
        buckets, lk_dropped, _ = _bucketize(payload, target, q_valid, S, cap)
        recv = jax.lax.all_to_all(buckets, axis, split_axis=0, concat_axis=0, tiled=True)
        rq = recv.reshape(S * cap, W + 2)
        r_words = rq[:, :W]
        r_qid = rq[:, W].astype(I32)
        r_valid = rq[:, W + 1].astype(bool)
        idx, found = table_lookup(t_words, t_n, r_words)
        found = found & r_valid
        # answer packing: found(1) | left ext call(3, codes 0..5) |
        # right(3) | count(16) = 23 bits; counts up to MAX_KMER_COUNT=0xFFFF
        # round-trip exactly (advisor round-1 finding: the old 15-bit layout
        # wrapped counts >= 32768)
        ans = (
            found.astype(U32)
            | (t_left[idx].astype(U32) << U32(1))
            | (t_right[idx].astype(U32) << U32(4))
            | (jnp.clip(t_count[idx], 0, MAX_KMER_COUNT).astype(U32) << U32(7))
        )
        ans = jnp.where(r_valid, ans, U32(0))
        # route answers + owner row idx back; slot (s,c) returns to shard s
        stack = jnp.stack(
            [ans, idx.astype(U32), r_qid.astype(U32), r_valid.astype(U32)], axis=-1
        )
        back = stack.reshape(S, cap, 4)
        recv_back = jax.lax.all_to_all(back, axis, split_axis=0, concat_axis=0, tiled=True)
        flat = recv_back.reshape(S * cap, 4)
        dest = jnp.where(flat[:, 3].astype(bool), flat[:, 2].astype(I32), Q)
        out = jnp.zeros((Q + 1,), U32)
        out = out.at[dest].set(flat[:, 0], mode="drop")
        oidx = jnp.zeros((Q + 1,), U32)
        oidx = oidx.at[dest].set(flat[:, 1], mode="drop")
        return out[None, :Q], oidx[None, :Q], lk_dropped[None]

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec,) * 7,
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    with jax.set_mesh(mesh):
        ans, oidx, lk_dropped = fn(
            query_words, query_valid, table.words, table.count, table.left, table.right, table.n
        )
    n_dropped = int(jnp.sum(lk_dropped))
    if n_dropped:
        # a dropped query would silently read as found=False and split a
        # contig (advisor round-1 finding); retry at higher capacity
        raise _BucketOverflow(cap, n_dropped)
    found = (ans & U32(1)).astype(bool)
    left = ((ans >> U32(1)) & U32(0x7)).astype(jnp.uint8)
    right = ((ans >> U32(4)) & U32(0x7)).astype(jnp.uint8)
    count = ((ans >> U32(7)) & U32(0xFFFF)).astype(I32)
    return found, count, left, right, oidx.astype(I32)
