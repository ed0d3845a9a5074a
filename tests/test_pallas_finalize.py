"""Fused scan+purge+compact kernel vs the XLA reference formulation."""

import numpy as np
import pytest
import jax.numpy as jnp

from mhm2_proxy_tpu.constants import words32_for_k
from mhm2_proxy_tpu.ops import count as C
from mhm2_proxy_tpu.ops.pallas_compact import ragged_append
from mhm2_proxy_tpu.ops.pallas_finalize import TILE, _TR, scan_purge_compact

from test_count import reads_to_block
from test_raw_lsm import genome_reads


def _shift_compact_host(vals, keep):
    idx = np.nonzero(keep)[0]
    out = []
    for v in vals:
        o = np.full_like(v, 0xFFFFFFFF)
        o[: idx.size] = v[idx]
        out.append(o)
    return out, idx.size


@pytest.mark.parametrize("pattern", ["random", "all", "none", "alt", "head", "tail"])
def test_shift_compact_unit(rng, pattern):
    """The log-shift stable compaction, one tile, via the real kernel in
    interpret mode (exercised through scan_purge_compact is indirect; here
    drive _shift_compact directly)."""
    import jax
    from mhm2_proxy_tpu.ops.pallas_finalize import _shift_compact

    n = TILE
    if pattern == "random":
        keep = rng.random(n) < 0.23
    elif pattern == "all":
        keep = np.ones(n, bool)
    elif pattern == "none":
        keep = np.zeros(n, bool)
    elif pattern == "alt":
        keep = (np.arange(n) % 3) == 1
    elif pattern == "head":
        keep = np.arange(n) < 1000
    else:
        keep = np.arange(n) >= n - 999
    vals = [rng.integers(0, 1 << 32, n, dtype=np.int64).astype(np.uint32) for _ in range(3)]
    drops_before = np.cumsum(~keep) - (~keep)

    def run(vals, keep, db):
        v2 = [jnp.asarray(v).reshape(_TR, 128) for v in vals]
        comp, live = _shift_compact(
            v2, jnp.asarray(keep).reshape(_TR, 128),
            jnp.asarray(db, np.int32).reshape(_TR, 128), _TR, jnp.roll,
        )
        return [jnp.where(live, v, jnp.uint32(0xFFFFFFFF)).reshape(-1) for v in comp]

    got = jax.jit(run)(vals, keep, drops_before)
    want, nk = _shift_compact_host(vals, keep)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g)[:nk], w[:nk])


@pytest.mark.parametrize("k,purge", [(21, True), (21, False), (33, True)])
def test_scan_purge_compact_vs_xla(rng, k, purge):
    W = words32_for_k(k)
    blk = reads_to_block(genome_reads(rng, 3000, 400, k + 10, 100, low_q_frac=0.05))
    run = C.block_to_raw_run(*[np.asarray(x) for x in blk], k)
    N = run[0].shape[0]
    Np = -(-N // TILE) * TILE
    lanes = tuple(
        jnp.concatenate([x, jnp.full((Np - N,), 0xFFFFFFFF, jnp.uint32)])
        for x in run
    )
    comp, cnts = scan_purge_compact(lanes, k, dmin_thres=2, purge=purge,
                                    interpret=True)
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)]
    ).astype(jnp.int32)
    out = ragged_append(comp, jnp.zeros_like(cnts), off, interpret=True)
    n = int(off[-1])

    # XLA reference: the existing final_from_sorted_packed fallback
    ref = C.final_from_sorted_packed(run, k, W, dmin_thres=2, purge=purge)
    weff = len(run)
    if purge:
        r_words, r_cnt, r_l, r_r, r_n = ref
        assert n == int(r_n)
        got_w = np.stack([np.asarray(x[:n]) for x in out[:weff]], -1)
        np.testing.assert_array_equal(got_w, np.asarray(r_words[: int(r_n), :weff]))
        pay = np.asarray(out[weff][:n])
        np.testing.assert_array_equal(pay & 0xFFFF, np.asarray(r_cnt[:n]))
        np.testing.assert_array_equal((pay >> 16) & 0xFF, np.asarray(r_l[:n]))
        np.testing.assert_array_equal(pay >> 24, np.asarray(r_r[:n]))
    else:
        r_words, r_cnt, r_l4, r_r4, r_n = ref
        assert n == int(r_n)
        got_w = np.stack([np.asarray(x[:n]) for x in out[:weff]], -1)
        np.testing.assert_array_equal(got_w, np.asarray(r_words[: int(r_n), :weff]))
        np.testing.assert_array_equal(np.asarray(out[weff][:n]), np.asarray(r_cnt[:n]))
        lo = lambda x: np.asarray(x[:n]) & 0xFFFF
        hi = lambda x: np.asarray(x[:n]) >> 16
        l4 = np.stack([lo(out[weff + 1]), hi(out[weff + 1]), lo(out[weff + 2]), hi(out[weff + 2])], -1)
        r4 = np.stack([lo(out[weff + 3]), hi(out[weff + 3]), lo(out[weff + 4]), hi(out[weff + 4])], -1)
        np.testing.assert_array_equal(l4, np.asarray(r_l4[:n]))
        np.testing.assert_array_equal(r4, np.asarray(r_r4[:n]))


def test_scan_purge_compact_multi_tile_groups(rng):
    """Groups spanning tile boundaries: few distinct keys, huge counts."""
    k = 21
    W = words32_for_k(k)
    base = genome_reads(rng, 80, 40, 60, 61)  # tiny genome -> heavy dup
    blk = reads_to_block(base * 40)
    run = C.block_to_raw_run(*[np.asarray(x) for x in blk], k)
    N = run[0].shape[0]
    Np = -(-N // TILE) * TILE
    lanes = tuple(
        jnp.concatenate([x, jnp.full((Np - N,), 0xFFFFFFFF, jnp.uint32)])
        for x in run
    )
    comp, cnts = scan_purge_compact(lanes, k, purge=True, interpret=True)
    off = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)]).astype(jnp.int32)
    out = ragged_append(comp, jnp.zeros_like(cnts), off, interpret=True)
    n = int(off[-1])
    ref = C.final_from_sorted_packed(run, k, W, purge=True)
    assert n == int(ref[4])
    got_w = np.stack([np.asarray(x[:n]) for x in out[:2]], -1)
    np.testing.assert_array_equal(got_w, np.asarray(ref[0][:n, :2]))
    pay = np.asarray(out[2][:n])
    np.testing.assert_array_equal(pay & 0xFFFF, np.asarray(ref[1][:n]))


@pytest.mark.parametrize("k,purge", [(63, True), (77, True), (63, False)])
def test_scan_purge_compact_sep_payload(rng, k, purge):
    """Separate-payload layout (k=63/77) through the kernel vs the XLA
    fallback of final_from_sorted_sep."""
    W = words32_for_k(k)
    weff = -(-2 * k // 32)
    blk = reads_to_block(genome_reads(rng, 2500, 300, k + 5, 120))
    run = C.block_to_raw_run_sep(*[np.asarray(x) for x in blk], k)
    ref = C.final_from_sorted_sep(run, k, W, dmin_thres=2, purge=purge)

    N = run[0].shape[0]
    Np = -(-N // TILE) * TILE
    keys = tuple(
        jnp.concatenate([x, jnp.full((Np - N,), 0xFFFFFFFF, jnp.uint32)])
        for x in run[:weff]
    )
    pay = jnp.concatenate([run[weff], jnp.zeros((Np - N,), jnp.uint32)])
    comp, cnts = scan_purge_compact(keys, k, dmin_thres=2, purge=purge,
                                    interpret=True, pay=pay)
    off = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)]).astype(jnp.int32)
    out = ragged_append(comp, jnp.zeros_like(cnts), off, interpret=True)
    n = int(off[-1])
    assert n == int(ref[4])
    got_w = np.stack([np.asarray(x[:n]) for x in out[:weff]], -1)
    np.testing.assert_array_equal(got_w, np.asarray(ref[0][:n, :weff]))
    if purge:
        p = np.asarray(out[weff][:n])
        np.testing.assert_array_equal(p & 0xFFFF, np.asarray(ref[1][:n]))
        np.testing.assert_array_equal((p >> 16) & 0xFF, np.asarray(ref[2][:n]))
        np.testing.assert_array_equal(p >> 24, np.asarray(ref[3][:n]))
    else:
        np.testing.assert_array_equal(np.asarray(out[weff][:n]), np.asarray(ref[1][:n]))
