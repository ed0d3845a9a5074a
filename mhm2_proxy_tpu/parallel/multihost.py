"""Multi-host (DCN) execution: 2-D mesh, hierarchical exchange, host utils.

The reference scales past one node with (a) a node-aware ThreeTierAggrStore
(upcxx-utils/include/upcxx_utils/three_tier_aggr_store.hpp:289-316: rank
microblocks -> node-shared blocks -> ONE rpc per node pair -> local fan-out),
(b) per-host byte-range FASTQ ingest (src/fastq.cpp:399-455), and (c) an
N-ranks-one-file collective writer (upcxx-utils/src/ofstream.cpp:113-202).

TPU-native equivalents here:
  * `init_multihost` / `make_host_mesh`: `jax.distributed` init + a 2-D
    ("dcn", "ici") mesh — DCN = inter-host axis, ICI = intra-host axis.
  * `HierarchicalCounter`: k-mer counting whose exchange is staged
    node-aware, the 3-tier analog:
      stage A: all_to_all over "ici" routes rows to the local device whose
        index matches the target's local index (intra-host gather);
      combine:  sender presum over the host's combined rows (the node-shared
        block dedup — less DCN volume);
      stage B: all_to_all over "dcn" ships each host-block to the target
        host in one collective step (one "message" per host pair).
    Both stages return overflow leftovers; spill rounds re-exchange them
    until none remain (lossless under arbitrary skew).
  * `host_byte_ranges` + `write_fasta_multihost`: per-host input splits and
    coordinated one-file output.

Global shard ids are host-major: shard = t_host * D + t_dev, matching a
("dcn", "ici")-sharded leading axis, so `ShardedTable`, `sharded_lookup`
(over the combined ("dcn", "ici") axis pair) and the sharded traversal work
unchanged on the hierarchical counter's output.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import minimizer_len_for_k, words32_for_k
from ..ops import count as C  # noqa: F401  (kept: step closures resolve via sharded helpers)
from .sharded import (
    ShardedTable,
    put_sharded,
    _bucketize,
    _presum_duplicates,
    _record_fns,
    ShardedCounter,
)

I32 = jnp.int32
I64 = jnp.int64
U32 = jnp.uint32


def init_multihost(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None):
    """Initialize jax.distributed for multi-process execution.

    On real multi-host TPU slices the arguments come from the environment
    and may all be None (reference launcher role, src/mhm2.py:446-466).
    """
    kwargs = {}
    if coordinator is not None:
        kwargs.update(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_host_mesh(n_hosts: int | None = None, per_host: int | None = None) -> Mesh:
    """2-D ("dcn", "ici") mesh over all devices.

    Defaults: n_hosts = jax.process_count(), per_host = local device count.
    Single-process virtual meshes (tests) pass explicit shapes.
    """
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = jax.process_count()
    if per_host is None:
        per_host = len(devs) // n_hosts
    assert n_hosts * per_host <= len(devs), (n_hosts, per_host, len(devs))
    assert n_hosts <= 256, "t_host rides in 8 spare meta bits"
    return jax.make_mesh((n_hosts, per_host), ("dcn", "ici"),
                         devices=devs[: n_hosts * per_host])


class HierarchicalCounter(ShardedCounter):
    """Sharded k-mer counting with a node-aware two-stage exchange.

    Drop-in alternative to ShardedCounter over a ("dcn", "ici") mesh; the
    final table layout (leading global-shard axis, host-major) and all
    downstream consumers (finalize, lookup, traversal) are identical.
    """

    def __init__(self, k: int, mesh: Mesh, dmin_thres: int = 2,
                 bucket_cap: int | None = None, use_supermers: bool = True,
                 smax: int = 24):
        assert mesh.axis_names == ("dcn", "ici"), mesh.axis_names
        self.H, self.D = mesh.devices.shape
        super().__init__(k, mesh, dmin_thres=dmin_thres, bucket_cap=bucket_cap,
                         use_supermers=use_supermers, smax=smax)
        assert self.S == self.H * self.D

    # partition spec helpers: data arrays shard their leading axis over BOTH
    # mesh axes (host-major), so S = H*D global rows land one per device
    def _spec(self):
        return P(("dcn", "ici"))

    def _build_count_step(self, B, L, cap, ctg_mode: bool):
        k, m, S, H, D = self.k, self.m, self.S, self.H, self.D
        mesh = self.mesh
        mode = "min" if ctg_mode else "sum"
        make_records, receive_agg, count_of, with_count, R = _record_fns(
            k, m, self.smax, S, self.use_supermers, ctg_mode
        )
        # spare meta bits where the target host index rides across stage A
        if self.use_supermers:
            host_shift = U32(24)  # meta = n(8) | count(16) | t_host(8)
        else:
            W = words32_for_k(k)
            host_shift = U32(17)  # meta = left(8) | right(8) | valid(1) | t_host(8)
        meta_col = R - 1 if self.use_supermers else words32_for_k(k)

        def set_host(payload, t_host):
            meta = (payload[:, meta_col] & ~(U32(0xFF) << host_shift)) | (
                t_host.astype(U32) << host_shift
            )
            return jnp.concatenate(
                [payload[:, :meta_col], meta[:, None], payload[:, meta_col + 1:]], axis=1
            )

        def get_host(payload):
            return ((payload[:, meta_col] >> host_shift) & U32(0xFF)).astype(I32)

        def two_stage_exchange(payload, target, valid):
            """records at any device -> owner device; returns received rows
            plus the stage-A leftover set (global target ids).

            Stage B cannot overflow: its input is at most D*cap rows and its
            per-destination capacity is exactly D*cap, so only stage-A
            leftovers exist — keeping spill-round shapes fixed."""
            t_host = target // D
            t_dev = target % D
            payload = set_host(payload, t_host)
            # stage A (ICI): route to local device t_dev on MY host
            bucketsA, overA, (lpA, ltA_dev, lvA) = _bucketize(payload, t_dev, valid, D, cap)
            recvA = jax.lax.all_to_all(bucketsA, "ici", split_axis=0, concat_axis=0, tiled=True)
            rows_a = recvA.reshape(D * cap, R)
            va = get_valid(rows_a)
            th_a = get_host(rows_a)
            # node-shared combine: presum the host's rows before DCN
            rows_a, th_a, va, n_collapsed = _presum_duplicates(
                rows_a, th_a, va, count_of, with_count, mode
            )
            # stage B (DCN): one collective step ships host-blocks
            bucketsB, _, _ = _bucketize(rows_a, th_a, va, H, cap * D)
            recvB = jax.lax.all_to_all(bucketsB, "dcn", split_axis=0, concat_axis=0, tiled=True)
            rows_b = recvB.reshape(H * cap * D, R)
            # stage-A leftovers with reconstructed GLOBAL targets
            gA = jnp.where(lvA, get_host(lpA) * D + ltA_dev, S)
            n_sent = jnp.sum(valid) - overA
            return rows_b, lpA, gA, lvA, n_sent, overA, n_collapsed

        def get_valid(payload):
            if self.use_supermers:
                return (payload[:, meta_col] & U32(0xFF)) > 0
            return ((payload[:, meta_col] >> U32(16)) & U32(1)).astype(bool)

        from ..ops import count as C

        do_split = self.compact_singles and not ctg_mode
        n_agg = 8 if do_split else 5

        def finish(recv):
            agg = receive_agg(recv)
            if do_split:
                agg = C.split_run(*agg)
            return agg

        def per_device_first(codes, qual_ok, lens, depth):
            payload, target, valid, n_kmers = make_records(codes, qual_ok, lens, depth)
            payload, target, valid, n_pre = _presum_duplicates(
                payload, target, valid, count_of, with_count, mode
            )
            recv, lp, lt, lv, n_sent, n_over, n_comb = two_stage_exchange(payload, target, valid)
            agg = finish(recv)
            stats = jnp.stack(
                [n_kmers.astype(I64), n_sent.astype(I64), n_over.astype(I64),
                 (n_pre + n_comb).astype(I64)]
            )
            return tuple(x[None] for x in agg), lp, lt, lv, stats[None]

        def per_device_spill(payload, target, valid):
            recv, lp, lt, lv, n_sent, n_over, n_comb = two_stage_exchange(payload, target, valid)
            agg = finish(recv)
            stats = jnp.stack(
                [jnp.zeros((), I64), n_sent.astype(I64), n_over.astype(I64), n_comb.astype(I64)]
            )
            return tuple(x[None] for x in agg), lp, lt, lv, stats[None]

        spec = self._spec()
        agg_specs = (spec,) * n_agg
        first_fn = jax.shard_map(
            per_device_first, mesh=mesh,
            in_specs=(P(("dcn", "ici")),) * 4,
            out_specs=(agg_specs,) + (spec,) * 4,
            check_vma=False,
        )
        spill_fn = jax.shard_map(
            per_device_spill, mesh=mesh,
            in_specs=(spec,) * 3,
            out_specs=(agg_specs,) + (spec,) * 4,
            check_vma=False,
        )

        def counters_of(agg, stats):
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

    def _add_block(self, codes, qual_ok, lens, depths):
        # identical control flow to ShardedCounter._add_block but with the
        # 2-D sharding spec for inputs
        ctg_mode = depths is not None
        SB, L = np.asarray(codes).shape
        B = SB // self.S
        P_ = L - self.k + 1
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
        if key not in self._count_steps:
            self._count_steps[key] = self._build_count_step(B, L, cap, ctg_mode)
        first_step, spill_step = self._count_steps[key]
        sharding = NamedSharding(self.mesh, self._spec())
        codes = put_sharded(codes, sharding)
        qual_ok = put_sharded(qual_ok, sharding)
        lens = put_sharded(lens, sharding)
        if depths is None:
            depths = np.ones((SB,), np.int32)
        depths = put_sharded(depths, sharding)
        with jax.set_mesh(self.mesh):
            agg, lp, lt, lv, counters = first_step(codes, qual_ok, lens, depths)
            n_left = self._push_counted(agg, counters, ctg_mode)
            while n_left > 0:
                self.spill_rounds += 1
                agg, lp, lt, lv, counters = spill_step(lp, lt, lv)
                n_left = self._push_counted(agg, counters, ctg_mode)


def host_byte_ranges(file_size: int, n_hosts: int) -> list[tuple[int, int]]:
    """Even byte-range split of an input file across hosts.

    Each host then resyncs its start to the next record boundary with the
    FastqReader state machine (io/fastq.py), mirroring the reference's
    per-node offset seeking (fastq.cpp:399-455).
    """
    per = file_size // n_hosts
    return [
        (h * per, file_size if h == n_hosts - 1 else (h + 1) * per)
        for h in range(n_hosts)
    ]


def min_sum_max(value: float) -> dict:
    """Cross-process min/avg/max of a scalar (reference MinSumMax reductions,
    upcxx-utils/timers.hpp:42-161, used for per-module time balance reports).

    Single-process: degenerate (min == avg == max == value)."""
    import jax

    if jax.process_count() <= 1:
        return dict(min=value, avg=value, max=value, n=1)
    from jax.experimental import multihost_utils

    vals = np.asarray(
        multihost_utils.process_allgather(jnp.asarray([value], jnp.float64))
    ).reshape(-1)
    return dict(
        min=float(vals.min()), avg=float(vals.mean()), max=float(vals.max()),
        n=len(vals),
    )


def check_read_id_disjointness(id_span: tuple[int, int] | None):
    """Verify no two processes assigned overlapping read-id ranges (the
    analog of the reference's neighbor-rank disjointness rpc,
    merge_reads.cpp:542-570, done as one allgather of [lo, hi] spans).

    id_span: local (min_abs_id, max_abs_id) from PackedReads.id_span(), or
    None when this process holds no identified reads. Raises on overlap.
    """
    from jax.experimental import multihost_utils

    lo, hi = id_span if id_span is not None else (-1, -1)
    spans = np.asarray(
        multihost_utils.process_allgather(jnp.asarray([lo, hi], dtype=jnp.int64))
    ).reshape(-1, 2)
    live = spans[spans[:, 0] >= 0]
    order = np.argsort(live[:, 0], kind="stable")
    live = live[order]
    for a, b in zip(live[:-1], live[1:]):
        if b[0] <= a[1]:
            raise ValueError(
                f"read-id ranges overlap across processes: {a.tolist()} vs {b.tolist()}"
            )
    return len(live)


def write_fasta_multihost(fname: str, local_payload: bytes, process_id: int,
                          n_processes: int, sizes: list[int] | None = None):
    """N-hosts-one-file coordinated write (reference dist_ofstream,
    ofstream.cpp:113-202: global offset claim + per-rank pwrite).

    sizes: per-process byte counts (exchanged out-of-band or via
    multihost_utils allgather by the caller); process p writes its block at
    sum(sizes[:p]).
    """
    if sizes is None:
        from jax.experimental import multihost_utils

        all_sizes = multihost_utils.process_allgather(
            jnp.asarray([len(local_payload)], dtype=jnp.int64)
        )
        sizes = [int(s) for s in np.asarray(all_sizes).reshape(-1)]
    offset = sum(sizes[:process_id])
    total = sum(sizes)
    # rank 0 creates/truncates; an explicit barrier orders the create before
    # any peer's open (the allgather above is NOT between create and open —
    # without this, a loaded machine loses the race and peers see ENOENT)
    if process_id == 0:
        with open(fname, "wb") as f:
            f.truncate(total)
    if n_processes > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("write_fasta_multihost_create")
    with open(fname, "r+b") as f:
        f.seek(offset)
        f.write(local_payload)
    return total
