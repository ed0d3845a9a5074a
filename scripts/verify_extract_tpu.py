#!/usr/bin/env python3
"""On-chip bit-exactness check of the fused extraction kernel.

Compares ops.pallas_extract.extract_record_lanes COMPILED on the real TPU
against the jnp reference path (read_kmer_records + sentinelize + payload
pack) for every production k. Exists because Mosaic miscompiled a top-bits
AND fused into a cross-vreg lane slice (see endmask in pallas_extract.py);
interpret-mode tests cannot catch codegen bugs.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from mhm2_proxy_tpu.ops import count as C
    from mhm2_proxy_tpu.ops.pallas_extract import extract_record_lanes
    from mhm2_proxy_tpu.constants import minimizer_len_for_k

    rng = np.random.default_rng(0)
    B, L = 1024, 160
    genome = rng.integers(0, 4, 200_000, dtype=np.uint8)
    starts = rng.integers(0, len(genome) - L, B)
    codes = np.stack([genome[s : s + L] for s in starts])
    nmask = rng.random((B, L)) < 0.01
    codes[nmask] = 4
    qual_ok = rng.random((B, L)) > 0.05
    lens = rng.integers(100, L + 1, B).astype(np.int32)
    cb, qb, lb = jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens)

    for k in (21, 33, 55, 77, 99):
        m = minimizer_len_for_k(k)
        lanes, pay = extract_record_lanes(cb, qb, lb, k)
        rec = C.read_kmer_records(cb, qb, lb, k, m)
        w_ref = np.asarray(C._sentinelize(rec["words"], rec["valid"]))
        v = np.asarray(rec["valid"]).reshape(-1)
        cnt = jnp.where(rec["valid"], rec["count"], 0).astype(jnp.int32)
        pay_ref = np.where(
            v, np.asarray(C._pack_cnt_ext(cnt, rec["left"], rec["right"])), 0
        )
        W = w_ref.shape[-1]
        w_k = np.stack([np.asarray(x) for x in lanes], -1).reshape(-1, W)
        np.testing.assert_array_equal(w_k, w_ref)
        np.testing.assert_array_equal(np.asarray(pay).reshape(-1), pay_ref)
        print(f"k={k}: bit-exact over {v.size} records ({int(v.sum())} valid)")

    # full production block shape: batch-size self-consistency (the jnp
    # formulation MISCOMPILED here, see bitkmer.revcomp_words note) and
    # count-mass conservation through the whole aggregation
    k, m = 21, minimizer_len_for_k(21)
    B, L = 131072, 160
    starts = rng.integers(0, len(genome) - L, B)
    codes = np.stack([genome[s : s + L] for s in starts])
    qual_ok = rng.random((B, L)) > 0.02
    lens = np.full(B, L, np.int32)
    cb, qb, lb = jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens)
    lanes_big, pay_big = extract_record_lanes(cb, qb, lb, k)
    lanes_sm, pay_sm = extract_record_lanes(cb[:1024], qb[:1024], lb[:1024], k)
    for i, (a, b) in enumerate(zip(lanes_big, lanes_sm)):
        np.testing.assert_array_equal(np.asarray(a[:1024]), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(pay_big[:1024]), np.asarray(pay_sm))
    print(f"full-block (B={B}) self-consistency: OK")

    run, ns = C.block_to_split_run(cb, qb, lb, k, m)
    n_valid = int(np.asarray(jnp.sum(pay_big != 0)))
    mass = int(np.asarray(jnp.sum(run[1])))  # multi counts
    n_single = int(np.asarray(run[7]))
    assert mass + n_single == n_valid, (mass, n_single, n_valid)
    print(
        f"count-mass conserved: {mass} (multi) + {n_single} (single) == "
        f"{n_valid} valid records"
    )

    # packed-emission kernel vs the general kernel, on-chip, production shape
    from mhm2_proxy_tpu.ops.pallas_extract import extract_packed_lanes
    from mhm2_proxy_tpu.constants import words32_for_k

    for kk in (21, 33, 55, 99):
        W = words32_for_k(kk)
        assert C.payload_fits_in_keys(kk, W)
        weff = -(-2 * kk // 32)
        free = 32 * weff - 2 * kk
        lanes_g, pay_g = extract_record_lanes(cb, qb, lb, kk)
        lanes_p = extract_packed_lanes(cb, qb, lb, kk)
        assert len(lanes_p) == weff
        pay7 = (
            (pay_g & 1)
            | (((pay_g >> 16) & 7) << 1)
            | (((pay_g >> 24) & 7) << 4)
        ).astype(jnp.uint32)
        km = np.uint32(0xFFFFFFFF ^ ((1 << free) - 1))
        exp_last = jnp.where(
            pay_g == 0, jnp.uint32(0xFFFFFFFF), (lanes_g[weff - 1] & km) | pay7
        )
        for i in range(weff - 1):
            np.testing.assert_array_equal(np.asarray(lanes_p[i]), np.asarray(lanes_g[i]))
        np.testing.assert_array_equal(np.asarray(lanes_p[-1]), np.asarray(exp_last))
        print(f"packed-emission k={kk}: bit-exact on-chip")

    # packed aggregation (fused scan kernel) vs the unpacked path, on-chip
    W = words32_for_k(k)
    flat_g = tuple(x.reshape(-1) for x in lanes_big)
    ref_split = jax.tree.map(np.asarray, C.aggregate_split_lanes(flat_g, pay_big.reshape(-1)))
    got_split = jax.tree.map(
        np.asarray,
        C.aggregate_split_packed(
            tuple(x.reshape(-1) for x in extract_packed_lanes(cb, qb, lb, k)), k, W
        ),
    )
    n_m, n_s = int(ref_split[4]), int(ref_split[7])
    assert (int(got_split[4]), int(got_split[7])) == (n_m, n_s), (
        n_m, n_s, int(got_split[4]), int(got_split[7]))
    for a, b in zip(ref_split[:4], got_split[:4]):
        np.testing.assert_array_equal(a[:n_m], b[:n_m])
    for a, b in zip(ref_split[5:7], got_split[5:7]):
        np.testing.assert_array_equal(a[:n_s], b[:n_s])
    print(f"packed aggregation (B={B}): equals unpacked path on-chip "
          f"({n_m} multi + {n_s} single)")

    # fused final fold vs the unfused cascade, on-chip
    run2, _ = C.block_to_split_run(cb[: B // 2], qb[: B // 2], lb[: B // 2], k, m)
    fused = jax.tree.map(np.asarray, C.final_fold_runs((run, run2), dmin_thres=2, purge=True))
    m1 = C.merge_aggregates(*run[:4], *C.expand_singles(run[5], run[6], run[7]))
    m2 = C.merge_aggregates(*run2[:4], *C.expand_singles(run2[5], run2[6], run2[7]))
    mm = C.merge_aggregates(*m1[:4], *m2[:4])
    unf = jax.tree.map(np.asarray, C.finalize_table(*mm, dmin_thres=2))
    nk = int(fused[4])
    assert nk == int(unf[4]), (nk, int(unf[4]))
    for a, b in zip(unf[:4], fused[:4]):
        np.testing.assert_array_equal(a[:nk], b[:nk])
    print(f"final_fold_runs: equals unfused cascade on-chip ({nk} kmers)")
    print("OK")


if __name__ == "__main__":
    main()
