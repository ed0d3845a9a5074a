"""Fused record-extraction Pallas kernel vs the jnp reference path.

The jnp path (read_kmer_records + _sentinelize + _pack_cnt_ext) is
oracle-pinned to the reference; the kernel must match it lane-for-lane on
valid rows and sentinelize invalid rows.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.ops import count as C
from mhm2_proxy_tpu.ops.pallas_extract import extract_record_lanes
from mhm2_proxy_tpu.constants import minimizer_len_for_k, words32_for_k


def _ref_lanes(codes, qual_ok, lens, k):
    m = minimizer_len_for_k(k)
    rec = C.read_kmer_records(jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), k, m)
    w = C._sentinelize(rec["words"], rec["valid"])
    cnt = jnp.where(rec["valid"], rec["count"], 0).astype(jnp.int32)
    pay = C._pack_cnt_ext(cnt, rec["left"], rec["right"])
    pay = jnp.where(rec["valid"], pay, 0)
    return np.asarray(w), np.asarray(pay), np.asarray(rec["valid"])


@pytest.mark.parametrize("k", [21, 33, 55, 77, 99])
def test_extract_matches_jnp(k):
    rng = np.random.default_rng(k)
    B, L = 64, 160
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    # sprinkle Ns
    nmask = rng.random((B, L)) < 0.02
    codes[nmask] = 4
    qual_ok = rng.random((B, L)) > 0.1
    lens = rng.integers(k + 1, L + 1, B).astype(np.int32)
    lens[:4] = [k, k + 1, k + 2, L]  # boundary lengths

    w_ref, pay_ref, valid = _ref_lanes(codes, qual_ok, lens, k)
    lanes, pay = extract_record_lanes(
        jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), k, interpret=True
    )
    W = words32_for_k(k)
    P = L - k + 1
    w_k = np.stack([np.asarray(x) for x in lanes], axis=-1).reshape(B * P, W)
    pay_k = np.asarray(pay).reshape(B * P)

    np.testing.assert_array_equal(w_k, w_ref)
    np.testing.assert_array_equal(pay_k, pay_ref)
    # at least some rows valid and some invalid were exercised
    assert valid.any() and (~valid).any()


def test_extract_feeds_aggregate_identically():
    """End-to-end: kernel lanes through the sort+dedup equal the jnp path."""
    k = 21
    m = minimizer_len_for_k(k)
    rng = np.random.default_rng(7)
    B, L = 32, 120
    genome = rng.integers(0, 4, 4000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = np.stack([genome[s : s + L] for s in starts])
    qual_ok = rng.random((B, L)) > 0.05
    lens = np.full(B, L, np.int32)

    rec = C.read_kmer_records(jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), k, m)
    ref = C.aggregate_records(rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"])

    lanes, pay = extract_record_lanes(
        jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), k, interpret=True
    )
    flat = tuple(x.reshape(-1) for x in lanes)
    got = C.aggregate_record_lanes(flat, pay.reshape(-1))

    n = int(ref[4])
    assert int(got[4]) == n
    for a, b in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(np.asarray(a)[:n], np.asarray(b)[:n])


@pytest.mark.parametrize("k", [21, 33, 55, 99])
def test_packed_key_split_matches_unpacked(k):
    """aggregate_split_lanes_packed (payload folded into free key bits) must
    equal the separate-payload-lane path exactly on both split parts."""
    m = minimizer_len_for_k(k)
    rng = np.random.default_rng(100 + k)
    B, L = 48, 160
    genome = rng.integers(0, 4, 6000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = np.stack([genome[s : s + L] for s in starts])
    nmask = rng.random((B, L)) < 0.01
    codes[nmask] = 4
    qual_ok = rng.random((B, L)) > 0.05
    lens = rng.integers(k, L + 1, B).astype(np.int32)

    lanes, pay = extract_record_lanes(
        jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), k, interpret=True
    )
    flat = tuple(x.reshape(-1) for x in lanes)
    assert C.payload_fits_in_keys(k, len(flat))
    ref = C.aggregate_split_lanes(flat, pay.reshape(-1))
    got = C.aggregate_split_lanes_packed(flat, pay.reshape(-1), k)

    n_m, n_s = int(ref[4]), int(ref[7])
    assert (int(got[4]), int(got[7])) == (n_m, n_s)
    for a, b in zip(ref[:4], got[:4]):  # multi part
        np.testing.assert_array_equal(np.asarray(a)[:n_m], np.asarray(b)[:n_m])
    for a, b in zip(ref[5:7], got[5:7]):  # singleton part
        np.testing.assert_array_equal(np.asarray(a)[:n_s], np.asarray(b)[:n_s])


@pytest.mark.parametrize("k", [21, 33, 55, 99])
def test_extract_packed_lanes_end_to_end(k):
    """Kernel-side packed emission -> aggregate_split_packed == unpacked."""
    from mhm2_proxy_tpu.ops.pallas_extract import extract_packed_lanes

    rng = np.random.default_rng(200 + k)
    B, L = 48, 160
    genome = rng.integers(0, 4, 6000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = np.stack([genome[s : s + L] for s in starts])
    codes[rng.random((B, L)) < 0.01] = 4
    qual_ok = rng.random((B, L)) > 0.05
    lens = rng.integers(k, L + 1, B).astype(np.int32)
    W = words32_for_k(k)
    assert C.payload_fits_in_keys(k, W)

    lanes, pay = extract_record_lanes(
        jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), k, interpret=True
    )
    ref = C.aggregate_split_lanes(
        tuple(x.reshape(-1) for x in lanes), pay.reshape(-1)
    )

    plane = extract_packed_lanes(
        jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), k, interpret=True
    )
    assert len(plane) == -(-2 * k // 32)
    got = C.aggregate_split_packed(tuple(x.reshape(-1) for x in plane), k, W)

    n_m, n_s = int(ref[4]), int(ref[7])
    assert (int(got[4]), int(got[7])) == (n_m, n_s)
    for a, b in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(np.asarray(a)[:n_m], np.asarray(b)[:n_m])
    for a, b in zip(ref[5:7], got[5:7]):
        np.testing.assert_array_equal(np.asarray(a)[:n_s], np.asarray(b)[:n_s])
