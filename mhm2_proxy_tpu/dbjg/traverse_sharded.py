"""Multi-shard de Bruijn traversal: cross-shard edge building + global stitch.

Converts the reference's rank-hopping RPC walks (dbjg_traversal.cpp:245-289,
one synchronous RPC per remote hop) into two batched cross-shard lookup
collectives — one per walk direction — followed by the same host path
decomposition as the single-shard path. Edge/conflict/self-loop semantics are
identical to dbjg/traverse.py::build_edges.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import bitkmer as bk
from ..parallel.sharded import ShardedTable, sharded_lookup, device_get_global
from .stitch import stitch_paths

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


def build_edges_sharded(table: ShardedTable, k: int):
    """Compute reciprocal UU edges across shards.

    Returns a dict of flat (S*T,) numpy arrays usable by stitch_paths, with
    neighbor indices encoded globally as owner_shard * T + row.
    """
    S = table.S
    T = table.words.shape[1]
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

    # pull to host and evaluate edge conditions globally
    uu = np.asarray(device_get_global(uu))
    b_rc = np.asarray(device_get_global(b_rc))
    p_rc = np.asarray(device_get_global(p_rc))
    a_first = np.asarray(device_get_global(a_first)).astype(np.uint8)
    a_last = np.asarray(device_get_global(a_last)).astype(np.uint8)
    r_found = np.asarray(device_get_global(r_found))
    l_found = np.asarray(device_get_global(l_found))
    b_left, b_right = np.asarray(device_get_global(b_left)), np.asarray(device_get_global(b_right))
    p_left, p_right = np.asarray(device_get_global(p_left)), np.asarray(device_get_global(p_right))
    b_idx, p_idx = np.asarray(device_get_global(b_idx)), np.asarray(device_get_global(p_idx))
    b_shard, p_shard = np.asarray(device_get_global(b_shard)), np.asarray(device_get_global(p_shard))

    self_gid = (np.arange(S)[:, None] * T + np.arange(T)[None, :]).astype(np.int64)
    b_gid = b_shard.astype(np.int64) * T + b_idx
    p_gid = p_shard.astype(np.int64) * T + p_idx

    b_uu = (b_left < 4) & (b_right < 4)
    p_uu = (p_left < 4) & (p_right < 4)
    b_left_or = np.where(b_rc, 3 - b_right, b_left)
    p_right_or = np.where(p_rc, 3 - p_left, p_right)
    r_ok = uu & r_found & b_uu & (b_left_or == a_first) & (b_gid != self_gid)
    l_ok = uu & l_found & p_uu & (p_right_or == a_last) & (p_gid != self_gid)
    r_port = np.where(b_rc, 1, 0)
    l_port = np.where(p_rc, 0, 1)

    # walk-termination classification, same rules as traverse.build_edges
    # (reference WalkTermStats, dbjg_traversal.cpp:114-141)
    def _term(found, n_left, n_right, ok, self_hit):
        n_uu = (n_left < 4) & (n_right < 4)
        deadend = uu & (~found | (found & ((n_left == 5) | (n_right == 5))))
        fork = uu & found & ~((n_left == 5) | (n_right == 5)) & ((n_left == 4) | (n_right == 4))
        conflict = uu & found & n_uu & ~ok & ~self_hit
        repeat = uu & found & self_hit
        return [int(deadend.sum()), int(fork.sum()), int(conflict.sum()), int(repeat.sum())]

    term_stats = np.array([
        _term(r_found, b_left, b_right, r_ok, b_gid == self_gid),
        _term(l_found, p_left, p_right, l_ok, p_gid == self_gid),
    ])

    flat = lambda x: x.reshape(S * T)
    return dict(
        uu=flat(uu),
        r_idx=flat(b_gid), r_port=flat(r_port), r_ok=flat(r_ok),
        l_idx=flat(p_gid), l_port=flat(l_port), l_ok=flat(l_ok),
        term_stats=term_stats,
    )


def traverse_debruijn_graph_sharded(table: ShardedTable, k: int, stats: dict | None = None):
    """Full multi-shard traversal -> list of (seq, depth).

    Note: contigs may differ from the single-shard path only in cycle break
    points (cycles break at the minimum *global node id*, which orders kmers
    by (owner shard, kmer) instead of globally by kmer).
    """
    edges = build_edges_sharded(table, k)
    if stats is not None:
        from .traverse import term_stats_to_dict

        stats["terminations"] = term_stats_to_dict(edges["term_stats"])
    words = np.asarray(device_get_global(table.words)).reshape(-1, table.words.shape[-1])
    count = np.asarray(device_get_global(table.count)).reshape(-1)
    return stitch_paths(edges, words, count, k)
