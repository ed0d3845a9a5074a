"""De Bruijn graph traversal as bulk path decomposition.

The reference walks the graph with synchronous per-hop RPCs claiming k-mers
first-writer-wins (src/dbjg_traversal.cpp:165-335), then repairs walk
collisions with two more phases (clean_frag_links / connect_frags,
dbjg_traversal.cpp:392-567). The final contigs are exactly the maximal paths
of the *reciprocal UU edge* graph (see oracle/pyref.py::traverse_oracle for
the equivalence argument), so we compute that directly:

1. build_edges (device): one batched lookup per side computes, for every UU
   k-mer, its left/right neighbor index, orientation, and edge validity —
   the latency-bound pointer chase becomes two vectorized table lookups.
2. stitch_paths (host): endpoints found in O(n); every path walked in
   parallel with vectorized numpy stepping; cycles broken at their minimum
   node index (the reference breaks at a nondeterministic walk start).

Contigs are emitted in canonical orientation (min of seq/revcomp) with depth
= sum of member k-mer counts / (len - k + 2) (dbjg_traversal.cpp:542).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import bitkmer as bk
from ..ops.lookup import table_join, table_join_payload, table_lookup  # noqa: F401 (lookup kept for small-Q callers)

U32 = jnp.uint32


@partial(jax.jit, static_argnames=("k",))
def build_edges(words, count, left, right, n, k: int):
    """Compute reciprocal UU edges for every table row.

    words/count/left/right/n: a FinalTable's arrays (lexsorted dense prefix).
    Returns per-row: uu (bool), and for each side s in {left=0, right=1}:
    nbr_idx (int32), nbr_entry_port (0=L, 1=R), ok (bool).

    Edge semantics (walking right from canonical A with ext r):
    B_oriented = A[1:] + r; valid iff B exists, B is UU, B oriented left ext
    == A[0] (CONFLICT check, dbjg_traversal.cpp:192-197), and B is not A
    itself (REPEAT, dbjg_traversal.cpp:204-207). Symmetric for the left side.
    """
    T = words.shape[0]
    row_valid = jnp.arange(T) < n
    uu = row_valid & (left < 4) & (right < 4)

    a_first = bk.first_base(words)
    a_last = bk.last_base(words, k)

    # right side: B_or = A[1:] + right
    b_or = bk.forward_base_words(words, right, k)
    b_can, b_rc = bk.canonicalize_words(b_or, k)
    # left side: P_or = left + A[:-1]
    p_or = bk.backward_base_words(words, left, k)
    p_can, p_rc = bk.canonicalize_words(p_or, k)
    # both directions answered by ONE sort-join (TPU: sorts beat the
    # bisection loop's dynamic row gathers by a wide margin). Queries from
    # non-UU rows are sentinelized: their results are never used, and letting
    # garbage keys collide with real ones could exceed the join's bounded
    # per-key multiplicity.
    q = jnp.concatenate([b_can, p_can])
    q = jnp.where(jnp.concatenate([uu, uu])[:, None], q, jnp.uint32(0xFFFFFFFF))
    # neighbor ext codes ride the join as a payload lane: four dynamic row
    # gathers (left/right at b_idx/p_idx, ~2T indices each) replaced by one
    # extra sort lane (gathers are the XLA:TPU anti-pattern). Ext codes are
    # 0..5, so 3 bits each: payload_bits=6 keeps the join's (idx, payload)
    # propagation in one u32 lane for tables up to 2^25 rows.
    ext_pay = left.astype(jnp.uint32) | (right.astype(jnp.uint32) << jnp.uint32(3))
    idx2, found2, pay2 = table_join_payload(words, n, q, ext_pay, payload_bits=6)
    b_idx, b_found = idx2[:T], found2[:T]
    p_idx, p_found = idx2[T:], found2[T:]
    b_left = (pay2[:T] & jnp.uint32(0x7)).astype(jnp.uint8)
    b_right = ((pay2[:T] >> jnp.uint32(3)) & jnp.uint32(0x7)).astype(jnp.uint8)
    b_uu = (b_left < 4) & (b_right < 4)
    # oriented left ext of B: comp(right) if B canonical is the rc of B_or
    b_left_or = jnp.where(b_rc, jnp.uint8(3) - b_right, b_left)
    self_idx = jnp.arange(T, dtype=jnp.int32)
    r_ok = uu & b_found & b_uu & (b_left_or == a_first.astype(jnp.uint8)) & (b_idx != self_idx)
    # port on B through which the walk enters and continues: entering via L
    # (canonical-aligned) exits via R; entering via R (rc) exits via L.
    r_port = jnp.where(b_rc, jnp.int32(1), jnp.int32(0))  # entry port on B

    p_left = (pay2[T:] & jnp.uint32(0x7)).astype(jnp.uint8)
    p_right = ((pay2[T:] >> jnp.uint32(3)) & jnp.uint32(0x7)).astype(jnp.uint8)
    p_uu = (p_left < 4) & (p_right < 4)
    p_right_or = jnp.where(p_rc, jnp.uint8(3) - p_left, p_right)
    l_ok = uu & p_found & p_uu & (p_right_or == a_last.astype(jnp.uint8)) & (p_idx != self_idx)
    l_port = jnp.where(p_rc, jnp.int32(0), jnp.int32(1))  # entry port on P

    # walk-termination classification per side (reference WalkTermStats,
    # dbjg_traversal.cpp:114-141): for UU kmers whose side has no edge,
    # record why the walk would have stopped there.
    def _term(found, n_uu, n_left, n_right, ok, self_hit):
        missing = uu & ~found
        deadend = uu & found & ((n_left == 5) | (n_right == 5))
        fork = uu & found & ~deadend & ((n_left == 4) | (n_right == 4))
        conflict = uu & found & n_uu & ~ok & ~self_hit
        repeat = uu & found & self_hit
        return (
            (missing | deadend).astype(jnp.int32).sum()
            , fork.astype(jnp.int32).sum()
            , conflict.astype(jnp.int32).sum()
            , repeat.astype(jnp.int32).sum()
        )

    r_stats = _term(b_found, b_uu, b_left, b_right, r_ok, b_idx == self_idx)
    l_stats = _term(p_found, p_uu, p_left, p_right, l_ok, p_idx == self_idx)

    return dict(
        uu=uu,
        r_idx=b_idx, r_port=r_port, r_ok=r_ok,
        l_idx=p_idx, l_port=l_port, l_ok=l_ok,
        term_stats=jnp.stack([jnp.stack(r_stats), jnp.stack(l_stats)]),
    )


def stitch_paths_walk(edges: dict, words, count, k: int):
    """Sequential-walker stitcher (reference implementation for tests;
    production uses dbjg.stitch.stitch_paths pointer doubling)."""
    uu = np.asarray(edges["uu"])
    n_rows = uu.shape[0]
    # nbr[i, port] = neighbor index reachable by exiting `port` of node i
    # exit port 1 (R) uses the right edge; exit port 0 (L) uses the left edge
    nbr = np.full((n_rows, 2), -1, np.int64)
    entry = np.zeros((n_rows, 2), np.int64)  # entry port on the neighbor
    r_ok = np.asarray(edges["r_ok"])
    l_ok = np.asarray(edges["l_ok"])
    nbr[:, 1] = np.where(r_ok, np.asarray(edges["r_idx"]), -1)
    entry[:, 1] = np.asarray(edges["r_port"])
    nbr[:, 0] = np.where(l_ok, np.asarray(edges["l_idx"]), -1)
    entry[:, 0] = np.asarray(edges["l_port"])

    counts = np.asarray(count)
    kmers = None  # lazily materialized strings

    uu_idx = np.nonzero(uu)[0]
    if uu_idx.size == 0:
        return []

    # walkers start at free ports: (node, exit_port) where the OTHER port has
    # no edge (path endpoint), walking out through exit_port.
    has_l = nbr[:, 0] >= 0
    has_r = nbr[:, 1] >= 0
    starts = []
    # endpoint with no left edge: walk rightward (exit port 1)
    for node in uu_idx[~has_l[uu_idx]]:
        starts.append((node, 1))
    for node in uu_idx[~has_r[uu_idx]]:
        starts.append((node, 0))
    # isolated UU nodes appear twice; dedup below by walk comparison

    visited = np.zeros(n_rows, bool)
    paths = []  # (list of (node, orientation_fwd))

    def walk(node, exit_port):
        """Walk from an endpoint; orientation fwd iff exiting via R port."""
        path = [(node, exit_port == 1)]
        seen = {node}
        cur, port = node, exit_port
        while True:
            nxt = nbr[cur, port]
            if nxt < 0 or nxt in seen:
                break
            ep = entry[cur, port]
            # entering nxt via ep; orientation fwd iff entered via L(0)
            path.append((int(nxt), ep == 0))
            seen.add(int(nxt))
            cur, port = int(nxt), 1 - ep
        return path

    for node, exit_port in starts:
        if visited[node]:
            continue
        path = walk(node, exit_port)
        for nd, _ in path:
            visited[nd] = True
        paths.append(path)

    # cycles: remaining unvisited UU nodes
    for node in uu_idx:
        if visited[node]:
            continue
        # break cycle at the minimum node index: walk right from `node`
        path = walk(node, 1)
        for nd, _ in path:
            visited[nd] = True
        paths.append(path)

    # dedup mirrored paths: a path and its reverse start/end at the two
    # endpoints; both were walked. Canonicalize by node tuple.
    uniq = {}
    for path in paths:
        key_f = tuple(nd for nd, _ in path)
        key_r = tuple(reversed(key_f))
        key = min(key_f, key_r)
        if key not in uniq:
            uniq[key] = path
    paths = list(uniq.values())

    if kmers is None:
        kmers = bk.words_to_strings(np.asarray(words), k)

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}

    def rc(s):
        return "".join(comp[c] for c in reversed(s))

    contigs = []
    for path in paths:
        n0, fwd0 = path[0]
        seq = kmers[n0] if fwd0 else rc(kmers[n0])
        for nd, fwd in path[1:]:
            km = kmers[nd] if fwd else rc(kmers[nd])
            seq += km[-1]
        depth_sum = int(sum(counts[nd] for nd, _ in path))
        s_rc = rc(seq)
        if s_rc < seq:
            seq = s_rc
        contigs.append((seq, depth_sum / (len(seq) - k + 2)))
    return contigs


def _resize_rows(table, target: int):
    T = table.words.shape[0]
    if target == T:
        return table
    import dataclasses

    if target < T:
        return dataclasses.replace(
            table,
            words=table.words[:target],
            count=table.count[:target],
            left=table.left[:target],
            right=table.right[:target],
        )
    padn = target - T
    words = jnp.concatenate(
        [table.words, jnp.full((padn, table.words.shape[1]), 0xFFFFFFFF, jnp.uint32)]
    )
    count = jnp.concatenate([table.count, jnp.zeros((padn,), table.count.dtype)])
    left = jnp.concatenate([table.left, jnp.full((padn,), 5, jnp.uint8)])
    right = jnp.concatenate([table.right, jnp.full((padn,), 5, jnp.uint8)])
    return dataclasses.replace(table, words=words, count=count, left=left, right=right)


def _pad_pow2(table):
    """Pad table arrays to the next power-of-two row count.

    Keeps build_edges/table_lookup compile shapes stable across rounds and
    runs (XLA recompiles per shape; table sizes are data dependent). Pad rows
    use the all-ones empty-key sentinel (sorts last, never UU).
    """
    T = table.words.shape[0]
    return _resize_rows(table, 1 << max(8, (T - 1).bit_length()))


def fit_table_rows(table):
    """Slice (or pad) table arrays to trim_rows(n) of the LIVE row count.

    A finalized table arrives at full LSM capacity, often >2x its occupancy;
    every sentinel pad row rides build_edges' join sorts at 3 rows each
    (1 table + 2 neighbor queries). The one-scalar host fetch (~20 ms over
    the tunnel) buys back several hundred ms at production sizes. Half-
    octave targets bound the compile-shape zoo (see ops.count.trim_rows).
    """
    from ..ops.count import trim_rows

    n = int(np.sum(np.asarray(table.n)))
    return _resize_rows(table, max(256, trim_rows(n)))


def term_stats_to_dict(term_stats) -> dict:
    """(2, 4) [right/left walk][deadend, fork, conflict, repeat] -> dict.

    The reference prints these per traversal (WalkTermStats::print_stats,
    dbjg_traversal.cpp:128-141)."""
    ts = np.asarray(term_stats).sum(axis=0)
    return dict(deadend=int(ts[0]), fork=int(ts[1]), conflict=int(ts[2]), repeat=int(ts[3]))


def traverse_debruijn_graph(table, k: int, stats: dict | None = None,
                            min_ctg_len: int = 0):
    """Full traversal of a FinalTable -> list of (seq, depth).

    If `stats` is a dict, it is filled with walk-termination counts
    (deadend/fork/conflict/repeat, reference dbjg_traversal.cpp:128-141).
    min_ctg_len > 0 drops contigs shorter than it before host
    materialization (the assembler passes k+2: shorter ones can never seed
    a later round nor print — at arctic scale they number in the tens of
    millions and exhausted host RAM as Python strings)."""
    from .stitch import stitch_paths

    table = fit_table_rows(table)
    edges = build_edges(table.words, table.count, table.left, table.right, table.n, k)
    if stats is not None:
        stats["terminations"] = term_stats_to_dict(edges["term_stats"])
    timings = {} if stats is not None else None
    out = stitch_paths(edges, table.words, table.count, k, timings=timings,
                       min_states=max(1, min_ctg_len - (k - 1)))
    if stats is not None:
        stats["stitch_timings"] = timings
    return out
