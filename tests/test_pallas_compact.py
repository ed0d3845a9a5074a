"""Pallas ragged-append compaction vs numpy reference (interpret mode).

The compiled kernel is additionally verified bit-equal against the XLA
fallback paths on real TPU hardware (scripts/profile_round.py workloads);
these tests pin the algorithm itself, including the boundary cases that
bit us during bring-up: the final carry spill (fixed by the phantom grid
step) and the phantom step clipping onto the last real block when
everything is kept.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.ops import pallas_compact as PC


def _check(flags, lanes, n_classes, emit):
    res = PC.compact_classes(
        tuple(jnp.asarray(x) for x in lanes), jnp.asarray(flags),
        n_classes, emit=emit, interpret=True,
    )
    for c, (out, cnt) in zip(emit, res):
        cnt = int(cnt)
        assert cnt == int((flags == c).sum())
        for i, lane in enumerate(lanes):
            got = np.asarray(out[i][:cnt])
            want = lane[flags == c]
            assert np.array_equal(got, want), (c, i)


@pytest.mark.parametrize("pdead", [0.8, 0.2, 0.99, 0.0, 1.0])
def test_compact_classes_random(pdead):
    rng = np.random.default_rng(0)
    N = PC.TILE * 7
    flags = rng.choice(
        [0, 1, 2], size=N, p=[(1 - pdead) * 0.7, (1 - pdead) * 0.3, pdead]
    ).astype(np.int32)
    lanes = tuple(
        rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
        for _ in range(3)
    )
    _check(flags, lanes, 3, (0, 1))


@pytest.mark.parametrize("pattern", ["all0", "all1", "one_tile", "alternate", "random"])
def test_compact_classes_adversarial(pattern):
    rng = np.random.default_rng(1)
    N = PC.TILE * 5
    flags = np.zeros(N, np.int32)
    if pattern == "all1":
        flags[:] = 1
    elif pattern == "one_tile":
        flags[PC.TILE : 2 * PC.TILE] = 1
    elif pattern == "alternate":
        flags[::2] = 1
    elif pattern == "random":
        flags = rng.integers(0, 2, N).astype(np.int32)
    lanes = tuple(
        rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
        for _ in range(2)
    )
    _check(flags, lanes, 2, (0, 1))


def test_compact_classes_lane_subsets():
    rng = np.random.default_rng(2)
    N = PC.TILE * 4
    flags = rng.integers(0, 3, N).astype(np.int32)
    lanes = tuple(
        rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
        for _ in range(4)
    )
    res = PC.compact_classes(
        tuple(jnp.asarray(x) for x in lanes), jnp.asarray(flags), 3,
        emit=(0, 1), emit_lanes=((0, 1, 2, 3), (0, 2)), interpret=True,
    )
    (m_out, n_m), (s_out, n_s) = res
    assert len(m_out) == 4 and len(s_out) == 2
    for i in range(4):
        assert np.array_equal(np.asarray(m_out[i][: int(n_m)]), lanes[i][flags == 0])
    for j, i in enumerate((0, 2)):
        assert np.array_equal(np.asarray(s_out[j][: int(n_s)]), lanes[i][flags == 1])
