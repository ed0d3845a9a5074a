"""Multi-shard de Bruijn traversal: cross-shard edge building + stitch.

Converts the reference's rank-hopping RPC walks (dbjg_traversal.cpp:245-289,
one synchronous RPC per remote hop) into two batched cross-shard lookup
collectives — one per walk direction — followed by distributed pointer
doubling (stitch_sharded.py). Edge/conflict/self-loop semantics are identical
to dbjg/traverse.py::build_edges. Nothing table-sized ever reaches the host:
edge arrays stay sharded on device and the stitch ships only compacted
on-path states.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import bitkmer as bk
from ..parallel.sharded import ShardedTable, sharded_lookup
from .stitch_sharded import stitch_paths_sharded

I32 = jnp.int32


@partial(jax.jit, static_argnames=("k",))
def _neighbor_queries(words, count, left, right, n, k: int):
    """Per-shard (vmapped) neighbor query construction for both directions."""

    def one_shard(words, count, left, right, n):
        T = words.shape[0]
        row_valid = jnp.arange(T) < n
        uu = row_valid & (left < 4) & (right < 4)
        b_or = bk.forward_base_words(words, right, k)
        b_can, b_rc = bk.canonicalize_words(b_or, k)
        p_or = bk.backward_base_words(words, left, k)
        p_can, p_rc = bk.canonicalize_words(p_or, k)
        return uu, b_can, b_rc, p_can, p_rc, bk.first_base(words), bk.last_base(words, k)

    return jax.vmap(one_shard)(words, count, left, right, n)


@partial(jax.jit, static_argnames=("k", "S", "m"))
def _edge_conditions(
    uu, b_rc, p_rc, a_first, a_last,
    r_found, b_left, b_right, b_idx,
    l_found, p_left, p_right, p_idx,
    b_shard, p_shard, k: int, S: int, m: int,
):
    """Elementwise edge/termination rules on the sharded (S, T) arrays."""
    T = uu.shape[1]
    self_gid = (
        jnp.arange(S, dtype=I32)[:, None] * T + jnp.arange(T, dtype=I32)[None, :]
    )
    b_gid = b_shard * T + b_idx
    p_gid = p_shard * T + p_idx
    b_uu = (b_left < 4) & (b_right < 4)
    p_uu = (p_left < 4) & (p_right < 4)
    b_left_or = jnp.where(b_rc, 3 - b_right.astype(I32), b_left.astype(I32))
    p_right_or = jnp.where(p_rc, 3 - p_left.astype(I32), p_right.astype(I32))
    r_ok = uu & r_found & b_uu & (b_left_or == a_first.astype(I32)) & (b_gid != self_gid)
    l_ok = uu & l_found & p_uu & (p_right_or == a_last.astype(I32)) & (p_gid != self_gid)
    r_port = jnp.where(b_rc, 1, 0).astype(I32)
    l_port = jnp.where(p_rc, 0, 1).astype(I32)

    # walk-termination classification, same rules as traverse.build_edges
    # (reference WalkTermStats, dbjg_traversal.cpp:114-141)
    def _term(found, n_left, n_right, ok, self_hit):
        n_uu = (n_left < 4) & (n_right < 4)
        deadend = uu & (~found | (found & ((n_left == 5) | (n_right == 5))))
        fork = uu & found & ~((n_left == 5) | (n_right == 5)) & ((n_left == 4) | (n_right == 4))
        conflict = uu & found & n_uu & ~ok & ~self_hit
        repeat = uu & found & self_hit
        return jnp.stack(
            [deadend.sum(), fork.sum(), conflict.sum(), repeat.sum()]
        ).astype(jnp.int64)

    term_stats = jnp.stack([
        _term(r_found, b_left, b_right, r_ok, b_gid == self_gid),
        _term(l_found, p_left, p_right, l_ok, p_gid == self_gid),
    ])
    edges = dict(
        uu=uu, r_gid=b_gid, r_port=r_port, r_ok=r_ok,
        l_gid=p_gid, l_port=l_port, l_ok=l_ok,
    )
    return edges, term_stats


def build_edges_sharded(table: ShardedTable, k: int):
    """Compute reciprocal UU edges across shards, kept sharded on device.

    Returns (edges, term_stats): edges is a dict of (S, T) device arrays
    (uu mask, global node id + port + ok per direction) consumed by
    stitch_paths_sharded; term_stats is a (2, 4) numpy array of walk
    termination counts (deadend/fork/conflict/repeat per direction).
    """
    S = table.S
    with jax.set_mesh(table.mesh):
        uu, b_can, b_rc, p_can, p_rc, a_first, a_last = _neighbor_queries(
            table.words, table.count, table.left, table.right, table.n, k
        )
    r_found, _, b_left, b_right, b_idx = sharded_lookup(table, b_can, uu)
    l_found, _, p_left, p_right, p_idx = sharded_lookup(table, p_can, uu)

    # owner shard of each query, computed source-side (same hash the router used)
    from ..constants import minimizer_len_for_k

    m = minimizer_len_for_k(k)

    @jax.jit
    def owner_shards(qw):
        return (
            bk.quick_hash_u64(jax.vmap(lambda w: bk.minimizers_from_words(w, k, m))(qw))
            % jnp.uint64(S)
        ).astype(I32)

    with jax.set_mesh(table.mesh):
        b_shard = owner_shards(b_can)
        p_shard = owner_shards(p_can)
        edges, term_stats = _edge_conditions(
            uu, b_rc, p_rc, a_first, a_last,
            r_found, b_left, b_right, b_idx,
            l_found, p_left, p_right, p_idx,
            b_shard, p_shard, k, S, m,
        )
    return edges, np.asarray(jax.device_get(term_stats))


def traverse_debruijn_graph_sharded(table: ShardedTable, k: int, stats: dict | None = None):
    """Full multi-shard traversal -> list of (seq, depth).

    Note: contigs may differ from the single-shard path only in cycle break
    points (cycles break at the minimum *global node id*, which orders kmers
    by (owner shard, kmer) instead of globally by kmer). Revcomp-palindromic
    cycles (an inverted-repeat loop traversing every node in both
    orientations) emit the segment up to re-entering the leader node; the
    single-shard walker stops at its first node re-visit instead — both are
    half-traversals with different split points (the reference's first-
    writer-wins claims are nondeterministic on such loops too,
    dbjg_traversal.cpp:204-207).
    """
    edges, term_stats = build_edges_sharded(table, k)
    if stats is not None:
        from .traverse import term_stats_to_dict

        stats["terminations"] = term_stats_to_dict(term_stats)
    return stitch_paths_sharded(table, edges, k, stats=stats)
