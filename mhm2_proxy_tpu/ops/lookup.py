"""Vectorized binary search over sorted k-mer tables.

The per-shard table is a lexsorted dense array of packed k-mer words; point
queries become a batched lower-bound search — the TPU-native replacement for
the reference's per-kmer hash probes (kcount_cpu.cpp:231-267) and RPC lookups
(kmer_dht.cpp:199-219).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lex_less_rows(a, b):
    """a < b lexicographically for (..., W) uint32 rows."""
    W = a.shape[-1]
    lt = a[..., W - 1] < b[..., W - 1]
    for w in range(W - 2, -1, -1):
        lt = (a[..., w] < b[..., w]) | ((a[..., w] == b[..., w]) & lt)
    return lt


@jax.jit
def table_lookup(table_words, n_valid, query_words):
    """Lower-bound binary search of query rows in a lexsorted table prefix.

    table_words: (T, W) uint32 sorted rows, valid prefix length n_valid.
    query_words: (Q, W) uint32.
    Returns (idx (Q,) int32, found (Q,) bool); idx is meaningful iff found.
    """
    T = table_words.shape[0]
    Q = query_words.shape[0]
    steps = max(1, (T - 1).bit_length() + 1) if T > 1 else 1
    lo = jnp.zeros((Q,), jnp.int32)
    hi = jnp.broadcast_to(n_valid.astype(jnp.int32), (Q,))

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        rows = table_words[mid]
        less = _lex_less_rows(rows, query_words)
        active = lo < hi
        new_lo = jnp.where(active & less, mid + 1, lo)
        new_hi = jnp.where(active & ~less, mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    idx = jnp.clip(lo, 0, T - 1)
    found = (lo < n_valid) & jnp.all(table_words[idx] == query_words, axis=-1)
    return idx, found
