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


def _bucketize(payload, target, valid, n_shards: int, cap: int):
    """Route rows into (n_shards, cap, R) fixed-capacity buckets.

    Rows beyond a bucket's capacity are dropped (counted); this mirrors the
    reference's bounded aggregating-store buffers.
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
    sent = jnp.sum(ok)
    n_valid = jnp.sum(valid)
    return out[: n_shards * cap].reshape(n_shards, cap, R), n_valid - sent


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
                 use_supermers: bool = True, smax: int = 24):
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
        self.dropped = 0
        self._count_steps = {}
        self._agg = jax.jit(jax.vmap(C.aggregate_records))
        self._merge = jax.jit(jax.vmap(C.merge_aggregates))
        self._finalize = jax.jit(
            jax.vmap(partial(C.finalize_table, dmin_thres=dmin_thres))
        )
        self._merge_ctg = jax.jit(jax.vmap(_merge_ctg_aggregates))
        self._apply_ctg = jax.jit(
            jax.vmap(partial(_apply_ctg_rules, dmin_thres=dmin_thres))
        )

    def _build_count_step(self, B, L, cap, ctg_mode: bool):
        if self.use_supermers:
            return self._build_supermer_step(B, L, cap, ctg_mode)
        k, m, S = self.k, self.m, self.S
        W = words32_for_k(k)
        mesh = self.mesh

        def per_device(codes, qual_ok, lens, depth):
            rec = C.read_kmer_records(
                codes, qual_ok, lens, k, m, n_shards=S,
                depth=depth if ctg_mode else None,
            )
            payload = _pack_records(rec)
            buckets, dropped = _bucketize(payload, rec["target"], rec["valid"], S, cap)
            recv = jax.lax.all_to_all(buckets, "shards", split_axis=0, concat_axis=0, tiled=True)
            return recv.reshape(S * cap, W + 2), dropped[None]

        fn = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P("shards"),) * 4,
            out_specs=(P("shards"), P("shards")),
            check_vma=False,
        )

        @jax.jit
        def step(codes, qual_ok, lens, depth):
            payloads, dropped = fn(codes, qual_ok, lens, depth)
            # payloads: (S * S*cap, W+2) -> (S, S*cap, W+2) one row per shard
            pl = payloads.reshape(self.S, self.S * cap, W + 2)
            words, left, right, count, valid = jax.vmap(partial(_unpack_records, W=W))(pl)
            if ctg_mode:
                agg = jax.vmap(_aggregate_ctg_records)(words, left, right, count, valid)
            else:
                agg = jax.vmap(C.aggregate_records)(words, left, right, count, valid)
            return agg, jnp.sum(dropped)

        return step

    def _build_supermer_step(self, B, L, cap, ctg_mode: bool):
        """Supermer-compressed exchange: ~smax x less all-to-all volume.

        The reference's supermer aggregation (kcount_cpu.cpp:84-103) expressed
        as fixed-capacity packed records; the receiver replays the standard
        counting path over the unpacked windows.
        """
        k, m, S, smax = self.k, self.m, self.S, self.smax
        mesh = self.mesh
        nb, cw, mw, rw = supermer_layout(k, smax)

        def per_device(codes, qual_ok, lens, depth):
            sup = build_supermers(
                codes, qual_ok, lens, k, m, smax, S,
                depth=depth if ctg_mode else None,
            )
            buckets, dropped = _bucketize(sup["records"], sup["target"], sup["valid"], S, cap)
            recv = jax.lax.all_to_all(buckets, "shards", split_axis=0, concat_axis=0, tiled=True)
            return recv.reshape(S * cap, rw), dropped[None]

        fn = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P("shards"),) * 4,
            out_specs=(P("shards"), P("shards")),
            check_vma=False,
        )

        @jax.jit
        def step(codes, qual_ok, lens, depth):
            payloads, dropped = fn(codes, qual_ok, lens, depth)
            pl = payloads.reshape(self.S, self.S * cap, rw)

            def expand_and_agg(recs):
                s_codes, s_qok, s_lens, s_depth = expand_supermers(recs, k, smax)
                rec = C.read_kmer_records(
                    s_codes, s_qok, s_lens, k, m, n_shards=1,
                    depth=s_depth if ctg_mode else None,
                )
                if ctg_mode:
                    return _aggregate_ctg_records(
                        rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"]
                    )
                return C.aggregate_records(
                    rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"]
                )

            agg = jax.vmap(expand_and_agg)(pl)
            return agg, jnp.sum(dropped)

        return step

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
        # bucket_cap is in KMERS; the supermer path converts to records
        if self.bucket_cap:
            kmer_cap = self.bucket_cap
        else:
            kmer_cap = max(256, int(B * P_ // max(self.S, 1) * 2))
        if self.use_supermers:
            cap = max(64, kmer_cap // self.smax * 3)
        else:
            cap = kmer_cap
        key = (B, L, cap, ctg_mode)
        steps = self._count_steps
        if key not in steps:
            steps[key] = self._build_count_step(B, L, cap, ctg_mode)
        sharding = NamedSharding(self.mesh, P("shards"))
        codes = jax.device_put(jnp.asarray(codes), sharding)
        qual_ok = jax.device_put(jnp.asarray(qual_ok), sharding)
        lens = jax.device_put(jnp.asarray(lens), sharding)
        if depths is None:
            depths = jnp.zeros((SB,), jnp.int32)
        depths = jax.device_put(jnp.asarray(depths), sharding)
        with jax.set_mesh(self.mesh):
            agg, dropped = steps[key](codes, qual_ok, lens, depths)
            if ctg_mode:
                self._push_ctg_run(agg)
            else:
                self._push_run(agg)
        self.dropped += int(dropped)

    def _push_run(self, agg):
        self.runs.append(agg)
        while len(self.runs) >= 2 and self.runs[-1][0].shape[1] >= self.runs[-2][0].shape[1] // 2:
            b = self.runs.pop()
            a = self.runs.pop()
            self.runs.append(self._merge(*a[:4], *b[:4]))

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
            self.runs.append(self._merge(*a[:4], *b[:4]))
        if not self.runs:
            W = words32_for_k(self.k)
            z = jnp.full((self.S, 1, W), 0xFFFFFFFF, U32)
            self.runs.append(
                (z, jnp.zeros((self.S, 1), I64), jnp.zeros((self.S, 1, 4), I64),
                 jnp.zeros((self.S, 1, 4), I64), jnp.zeros((self.S,), I32))
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
        w = jax.device_get(self.words)
        c = jax.device_get(self.count)
        l = jax.device_get(self.left)
        r = jax.device_get(self.right)
        n = jax.device_get(self.n)
        return [
            FinalTable(self.k, w[s], c[s], l[s], r[s], n[s]) for s in range(self.S)
        ]


def sharded_lookup(table: ShardedTable, query_words, query_valid, cap: int | None = None):
    """Cross-shard batched point lookup.

    query_words: (S, Q, W) per-source-shard canonical k-mer queries with
    query_valid: (S, Q) bool. Returns (found, count, left, right), each
    (S, Q), aligned with the queries.
    """
    S, Q, W = query_words.shape
    k, m = table.k, minimizer_len_for_k(table.k)
    cap = cap or max(64, 2 * Q // max(S, 1) + 64)
    mesh = table.mesh

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
        buckets, _ = _bucketize(payload, target, q_valid, S, cap)
        recv = jax.lax.all_to_all(buckets, "shards", split_axis=0, concat_axis=0, tiled=True)
        rq = recv.reshape(S * cap, W + 2)
        r_words = rq[:, :W]
        r_qid = rq[:, W].astype(I32)
        r_valid = rq[:, W + 1].astype(bool)
        idx, found = table_lookup(t_words, t_n, r_words)
        found = found & r_valid
        ans = (
            found.astype(U32)
            | (t_left[idx].astype(U32) << U32(1))
            | (t_right[idx].astype(U32) << U32(9))
            | (jnp.clip(t_count[idx], 0, MAX_KMER_COUNT).astype(U32) << U32(17))
        )
        ans = jnp.where(r_valid, ans, U32(0))
        # route answers + owner row idx back; slot (s,c) returns to shard s
        stack = jnp.stack(
            [ans, idx.astype(U32), r_qid.astype(U32), r_valid.astype(U32)], axis=-1
        )
        back = stack.reshape(S, cap, 4)
        recv_back = jax.lax.all_to_all(back, "shards", split_axis=0, concat_axis=0, tiled=True)
        flat = recv_back.reshape(S * cap, 4)
        dest = jnp.where(flat[:, 3].astype(bool), flat[:, 2].astype(I32), Q)
        out = jnp.zeros((Q + 1,), U32)
        out = out.at[dest].set(flat[:, 0], mode="drop")
        oidx = jnp.zeros((Q + 1,), U32)
        oidx = oidx.at[dest].set(flat[:, 1], mode="drop")
        return out[None, :Q], oidx[None, :Q]

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("shards"),) * 7,
        out_specs=(P("shards"), P("shards")),
        check_vma=False,
    )
    with jax.set_mesh(mesh):
        ans, oidx = fn(query_words, query_valid, table.words, table.count, table.left, table.right, table.n)
    found = (ans & U32(1)).astype(bool)
    left = ((ans >> U32(1)) & U32(0xFF)).astype(jnp.uint8)
    right = ((ans >> U32(9)) & U32(0xFF)).astype(jnp.uint8)
    count = ((ans >> U32(17)) & U32(0x7FFF)).astype(I32)
    return found, count, left, right, oidx.astype(I32)
