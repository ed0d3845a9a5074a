"""Pallas minimizer/target kernel vs the verified jnp path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.ops.bitkmer import minimizers_from_codes, quick_hash_u64
from mhm2_proxy_tpu.ops.pallas_minimizer import pallas_minimizer_targets
from mhm2_proxy_tpu.constants import minimizer_len_for_k


@pytest.mark.parametrize("k", [21, 33, 55])
def test_pallas_targets_match_jnp(rng, k):
    m = minimizer_len_for_k(k)
    B, L, S = 16, 96, 8
    codes = rng.integers(0, 5, (B, L), dtype=np.uint8)  # incl. N
    got = np.asarray(
        pallas_minimizer_targets(jnp.asarray(codes), k, m, S, interpret=True)
    )
    minz = minimizers_from_codes(jnp.asarray(codes), k, m)
    exp = np.asarray((quick_hash_u64(minz) % jnp.uint64(S)).astype(jnp.int32))
    assert (got == exp).all(), (got[:2], exp[:2])


def test_pallas_targets_big_shards(rng):
    k, m = 21, 15
    codes = rng.integers(0, 4, (8, 64), dtype=np.uint8)
    got = np.asarray(
        pallas_minimizer_targets(jnp.asarray(codes), k, m, 4096, interpret=True)
    )
    minz = minimizers_from_codes(jnp.asarray(codes), k, m)
    exp = np.asarray(
        (quick_hash_u64(minz) % jnp.uint64(4096)).astype(jnp.int32)
    )
    assert (got == exp).all()


def test_read_records_pallas_flag_equivalent(rng):
    """read_kmer_records(use_pallas=True) == default path (interpret mode)."""
    from mhm2_proxy_tpu.ops.count import read_kmer_records
    import jax

    k, m = 21, 15
    codes = jnp.asarray(rng.integers(0, 5, (16, 64), dtype=np.uint8))
    qual_ok = jnp.asarray(rng.random((16, 64)) > 0.1)
    lens = jnp.full((16,), 64, jnp.int32)
    # interpret-mode pallas under the hood on CPU
    from mhm2_proxy_tpu.ops import pallas_minimizer as pm
    import functools

    orig = pm.pallas_minimizer_targets
    pm_interp = functools.partial(orig, interpret=True)
    pm.pallas_minimizer_targets = pm_interp
    try:
        a = read_kmer_records(codes, qual_ok, lens, k, m, n_shards=8, use_pallas=True)
    finally:
        pm.pallas_minimizer_targets = orig
    b = read_kmer_records(codes, qual_ok, lens, k, m, n_shards=8)
    valid = np.asarray(b["valid"])
    assert (np.asarray(a["valid"]) == valid).all()
    assert (np.asarray(a["target"]) == np.asarray(b["target"])).all()
    # the pallas extraction path sentinelizes invalid rows (keys all-ones,
    # zero count/exts) where the jnp path leaves garbage; every consumer
    # masks by `valid`, so equivalence is over valid rows
    for key in ("words", "left", "right", "count"):
        assert (np.asarray(a[key])[valid] == np.asarray(b[key])[valid]).all(), key
    assert (np.asarray(a["words"])[~valid] == 0xFFFFFFFF).all()
    assert (np.asarray(a["count"])[~valid] == 0).all()
