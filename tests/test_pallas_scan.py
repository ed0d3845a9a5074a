"""Fused segmented group-sum scan kernel vs the XLA scan formula
(interpret mode; the compiled kernel is verified bit-equal on TPU against
the XLA fallback through aggregate_split_records)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.ops import pallas_scan as PS
from mhm2_proxy_tpu.constants import MAX_KMER_COUNT


@pytest.mark.parametrize("p_start", [0.3, 0.001, 0.9, 1.0])
def test_group_sums_scan_matches_numpy(p_start):
    rng = np.random.default_rng(0)
    N = PS.TILE * 5
    is_start = rng.random(N) < p_start
    is_start[0] = True
    pays = [rng.integers(0, 7, N).astype(np.int32) for _ in range(9)]
    pay = np.stack(pays, 1)
    cs = np.cumsum(pay, 0)
    b = np.where(is_start[:, None], cs - pay, 0)
    want = np.minimum(cs - np.maximum.accumulate(b, 0), MAX_KMER_COUNT)
    got = PS.group_sums_scan_lanes(
        tuple(jnp.asarray(p) for p in pays), jnp.asarray(is_start),
        clamp=MAX_KMER_COUNT, interpret=True,
    )
    for i in range(9):
        assert np.array_equal(np.asarray(got[i]), want[:, i]), i


def test_group_sums_scan_long_runs_and_clamp():
    """A single giant group spanning many tiles must clamp at the u16
    ceiling and keep cross-tile carries exact."""
    N = PS.TILE * 4
    is_start = np.zeros(N, bool)
    is_start[0] = True
    pays = [np.full(N, 3, np.int32)] + [np.zeros(N, np.int32)] * 8
    got = PS.group_sums_scan_lanes(
        tuple(jnp.asarray(p) for p in pays), jnp.asarray(is_start),
        clamp=MAX_KMER_COUNT, interpret=True,
    )
    g = np.asarray(got[0])
    want = np.minimum(np.arange(1, N + 1) * 3, MAX_KMER_COUNT)
    assert np.array_equal(g, want)


def test_group_sums_scan_packed_matches_jnp():
    """Packed-input scan kernel == jnp reference on packed sorted lanes."""
    import jax.numpy as jnp
    from mhm2_proxy_tpu.ops import count as C
    from mhm2_proxy_tpu.ops.pallas_scan import TILE, group_sums_scan_packed
    from mhm2_proxy_tpu.constants import MAX_KMER_COUNT

    k = 21
    weff = 2
    free = 32 * weff - 2 * k
    keymask = 0xFFFFFFFF ^ ((1 << free) - 1)
    rng = np.random.default_rng(3)
    N = 2 * TILE
    n_sent = 700
    # few distinct keys -> long groups; keys sorted; payload bits random
    keys = np.sort(rng.integers(0, 97, N - n_sent).astype(np.uint64))
    hi = (keys >> np.uint64(10)).astype(np.uint32)
    lo = ((keys << np.uint64(free)) & np.uint64(keymask)).astype(np.uint32)
    left = rng.integers(0, 6, N - n_sent).astype(np.uint32)
    right = rng.integers(0, 6, N - n_sent).astype(np.uint32)
    pay = 1 | (left << 1) | (right << 4)
    lane0 = np.concatenate([hi, np.full(n_sent, 0xFFFFFFFF, np.uint32)])
    lane1 = np.concatenate([(lo | pay).astype(np.uint32),
                            np.full(n_sent, 0xFFFFFFFF, np.uint32)])

    got = group_sums_scan_packed(
        (jnp.asarray(lane0), jnp.asarray(lane1)), keymask, MAX_KMER_COUNT,
        interpret=True,
    )

    # jnp reference via the unpacked path
    w = jnp.stack(
        [jnp.asarray(lane0),
         jnp.where(jnp.asarray(lane1) == 0xFFFFFFFF,
                   jnp.uint32(0xFFFFFFFF),
                   jnp.asarray(lane1) & jnp.uint32(keymask))], axis=-1)
    sent = (jnp.asarray(lane0) == 0xFFFFFFFF) & (jnp.asarray(lane1) == 0xFFFFFFFF)
    cnt = jnp.where(sent, 0, 1).astype(jnp.int32)
    l4 = C._ext_onehot(jnp.asarray(np.concatenate([left, np.full(n_sent, 7)])).astype(jnp.uint8), cnt)
    r4 = C._ext_onehot(jnp.asarray(np.concatenate([right, np.full(n_sent, 7)])).astype(jnp.uint8), cnt)
    sums, is_last, _ = C._group_sums_scan(w, cnt, l4, r4)
    ref = C._pack_sums(sums[:, 0], sums[:, 1:5], sums[:, 5:9])

    last = np.asarray(is_last)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g)[last], np.asarray(r)[last])
