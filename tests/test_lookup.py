"""Sort-join lookups: merge-join fast path == concat-sort path.

The TPU merge-join (ops/lookup.py) sorts only the queries and bitonic-merges
them with the already-sorted table; on CPU it runs through the Pallas
interpreter. Every (idx, found, payload) answer must equal the default
concat-sort join, including duplicate queries, misses, and sentinel rows.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.ops import lookup


def _mk_table(rng, T, W=2, n_valid=None):
    keys = np.unique(rng.integers(0, 1 << 42, 2 * T, dtype=np.uint64))[:T]
    keys.sort()
    words = np.stack(
        [(keys >> 10).astype(np.uint32), ((keys & 0x3FF) << 22).astype(np.uint32)],
        axis=-1,
    )
    n = T if n_valid is None else n_valid
    words[n:] = 0xFFFFFFFF  # sentinel tail
    return jnp.asarray(words), jnp.int32(n), keys[:n]


@pytest.mark.parametrize("Q", [64, 1000])
def test_merge_join_equals_concat_join(rng, Q):
    T = 512
    words, n, keys = _mk_table(rng, T, n_valid=T - 30)
    payload = jnp.asarray(rng.integers(0, 64, T, dtype=np.uint32))

    # queries: half hits, some duplicates, some misses, some sentinels
    hit = keys[rng.integers(0, len(keys), Q // 2)]
    miss = rng.integers(0, 1 << 42, Q - Q // 2 - 8, dtype=np.uint64)
    qk = np.concatenate([hit, miss])
    qw = np.stack(
        [(qk >> 10).astype(np.uint32), ((qk & 0x3FF) << 22).astype(np.uint32)],
        axis=-1,
    )
    qw = np.concatenate([qw, np.full((8, 2), 0xFFFFFFFF, np.uint32)])
    qw = jnp.asarray(qw)

    try:
        lookup._USE_MERGE_JOIN = False
        i0, f0, p0 = lookup.table_join_payload(words, n, qw, payload, payload_bits=6)
        lookup._USE_MERGE_JOIN = True
        i1, f1, p1 = lookup.table_join_payload(words, n, qw, payload, payload_bits=6)
    finally:
        lookup._USE_MERGE_JOIN = None
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(i0)[np.asarray(f0)], np.asarray(i1)[np.asarray(f1)])
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    # hits actually resolve to the right rows
    f = np.asarray(f1)
    assert f[: Q // 2].all()
    assert not f[-8:].any()


def test_merge_join_back_route_compact_path(rng):
    """Large-enough sizes route through the Pallas back-route compaction
    (TILE-aligned merged length); answers must match the concat join."""
    T, Q = 16384, 16000  # m = 32768 = one compaction tile
    words, n, keys = _mk_table(rng, T, n_valid=T - 100)
    payload = jnp.asarray(rng.integers(0, 64, T, dtype=np.uint32))
    hit = keys[rng.integers(0, len(keys), Q // 2)]
    miss = rng.integers(0, 1 << 42, Q - Q // 2, dtype=np.uint64)
    qk = np.concatenate([hit, miss])
    qw = jnp.asarray(np.stack(
        [(qk >> 10).astype(np.uint32), ((qk & 0x3FF) << 22).astype(np.uint32)],
        axis=-1,
    ))
    try:
        lookup._USE_MERGE_JOIN = False
        i0, f0, p0 = lookup.table_join_payload(words, n, qw, payload, payload_bits=6)
        lookup._USE_MERGE_JOIN = True
        i1, f1, p1 = lookup.table_join_payload(words, n, qw, payload, payload_bits=6)
    finally:
        lookup._USE_MERGE_JOIN = None
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(i0)[np.asarray(f0)], np.asarray(i1)[np.asarray(f1)])
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_merge_join_fused_epilogue_multi_tile(rng):
    """Multi-tile merged length with heavy key duplication: equal-key runs
    straddle the propagation kernel's tile boundaries (the carry/peek halo
    paths of ops.pallas_join)."""
    T, Q = 40000, 81072  # m = 131072 = 4 propagation tiles
    words, n, keys = _mk_table(rng, T, n_valid=T - 77)
    payload = jnp.asarray(rng.integers(0, 64, T, dtype=np.uint32))
    # queries heavily duplicated (up to ~15 per key) so runs cross tiles
    hit = keys[np.repeat(rng.integers(0, len(keys), Q // 8), 8)[: Q - 500]]
    miss = rng.integers(0, 1 << 42, 500, dtype=np.uint64)
    qk = np.concatenate([hit, miss])
    qw = jnp.asarray(np.stack(
        [(qk >> 10).astype(np.uint32), ((qk & 0x3FF) << 22).astype(np.uint32)],
        axis=-1,
    ))
    try:
        lookup._USE_MERGE_JOIN = False
        i0, f0, p0 = lookup.table_join_payload(words, n, qw, payload, payload_bits=6)
        lookup._USE_MERGE_JOIN = True
        i1, f1, p1 = lookup.table_join_payload(words, n, qw, payload, payload_bits=6)
    finally:
        lookup._USE_MERGE_JOIN = None
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(i0)[np.asarray(f0)], np.asarray(i1)[np.asarray(f1)])
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_merge_join_virtual_tile_pad(rng):
    """Total rows between tile-pow2 points: the merge pads to 6 physical
    tiles while the bitonic network runs at a virtual 8-tile size
    (ops/pallas_sort.py virtual sentinel tiles) — the fused epilogue must
    see only TABLE-flagged pads and answers must match the concat join."""
    T, Q = 60000, 110000  # total 170000 -> P = 6*32768 < M = 8*32768
    words, n, keys = _mk_table(rng, T, n_valid=T - 50)
    payload = jnp.asarray(rng.integers(0, 64, T, dtype=np.uint32))
    hit = keys[np.repeat(rng.integers(0, len(keys), Q // 8), 8)[: Q - 500]]
    miss = rng.integers(0, 1 << 42, 500, dtype=np.uint64)
    qk = np.concatenate([hit, miss])
    qw = jnp.asarray(np.stack(
        [(qk >> 10).astype(np.uint32), ((qk & 0x3FF) << 22).astype(np.uint32)],
        axis=-1,
    ))
    try:
        lookup._USE_MERGE_JOIN = False
        i0, f0, p0 = lookup.table_join_payload(words, n, qw, payload, payload_bits=6)
        lookup._USE_MERGE_JOIN = True
        i1, f1, p1 = lookup.table_join_payload(words, n, qw, payload, payload_bits=6)
    finally:
        lookup._USE_MERGE_JOIN = None
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(i0)[np.asarray(f0)], np.asarray(i1)[np.asarray(f1)])
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_join_above_fused_row_limit(rng, monkeypatch):
    """Tables at/above the fused 25-bit row limit (the arctic k=21 table
    trims to exactly 2^25 rows) take the separate-payload-lane sort join —
    a path no small-size test reaches because `fused` is then always true.
    Shrinking the limit drives it at test scale; answers must match the
    bisection ground truth, including duplicates and misses."""
    monkeypatch.setattr(lookup, "_FUSED_MAX_ROWS", 64)
    T, Q = 512, 3000
    words, n, keys = _mk_table(rng, T, n_valid=T - 30)
    payload = jnp.asarray(rng.integers(0, 64, T, dtype=np.uint32))
    # WITHOUT replacement: the join's documented precondition bounds
    # rows-per-key at max_dup (8 query dups + 1 table row stays inside)
    hit = keys[np.repeat(rng.choice(len(keys), Q // 8, replace=False), 8)[: Q - 100]]
    miss = rng.integers(0, 1 << 42, 100, dtype=np.uint64)
    qk = np.concatenate([hit, miss])
    qw = jnp.asarray(np.stack(
        [(qk >> 10).astype(np.uint32), ((qk & 0x3FF) << 22).astype(np.uint32)],
        axis=-1,
    ))
    i1, f1, p1 = lookup.table_join_payload.__wrapped__(
        words, n, qw, payload, max_dup=32, payload_bits=6)
    i0, f0 = lookup.table_lookup(words, n, qw)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(i0)[np.asarray(f0)],
                                  np.asarray(i1)[np.asarray(f1)])
    pay = np.asarray(payload)[np.asarray(i0)]
    np.testing.assert_array_equal(
        np.where(np.asarray(f0), pay, 0), np.asarray(p1))
