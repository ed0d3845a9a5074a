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
