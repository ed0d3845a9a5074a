"""Deferred-dedup (raw-run) LSM path vs the per-block-dedup path.

The raw path (ops.count block_to_raw_run / merge_raw_runs /
final_from_sorted_packed) must produce a bit-identical FinalTable: count and
extension sums clamp only at the shared u16 ceiling, so deferring dedup to
finalize is exact (see the raw-run section comment in ops/count.py).
"""

import numpy as np
import pytest

from mhm2_proxy_tpu.kcount import KmerCountStore
from mhm2_proxy_tpu.ops import count as C

from test_count import make_reads, reads_to_block


def genome_reads(rng, glen, n, lo, hi, low_q_frac=0.0):
    """Reads sampled from one random genome so k-mers recur (count >= 2
    survivors exist; purely random reads share almost no k-mers)."""
    g = "".join(rng.choice(list("ACGT"), size=glen))
    reads = []
    for _ in range(n):
        ln = int(rng.integers(lo, hi + 1))
        s = int(rng.integers(0, glen - ln + 1))
        seq = g[s : s + ln]
        quals = "".join(
            chr(33 + (5 if rng.random() < low_q_frac else 38)) for _ in range(ln)
        )
        reads.append((seq, quals))
    return reads


def _final_dict(store):
    t = store.finalize()
    return t.to_host_dict()


def _run_both(reads_blocks, k, ctg_blocks=None, raw_budget=2 << 30):
    a = KmerCountStore(k, raw_lsm=True, raw_budget_bytes=raw_budget)
    b = KmerCountStore(k, raw_lsm=False)
    assert a.raw_lsm, "raw mode must engage for this k"
    for blk in reads_blocks:
        a.add_reads_block(*blk)
        b.add_reads_block(*blk)
    if ctg_blocks:
        for cb in ctg_blocks:
            a.add_ctgs_block(*cb)
            b.add_ctgs_block(*cb)
    da, db = _final_dict(a), _final_dict(b)
    assert da == db, (
        f"raw vs dedup mismatch: {len(da)} vs {len(db)} rows; "
        f"diff keys: {list(set(da) ^ set(db))[:5]}; "
        f"diff vals: {[(x, da[x], db[x]) for x in da if x in db and da[x] != db[x]][:5]}"
    )
    return da


@pytest.mark.parametrize("k", [21, 33, 63, 77])
def test_raw_equals_dedup_multiblock(rng, k):
    blocks = [
        reads_to_block(genome_reads(rng, 800, 60, k + 5, 90, low_q_frac=0.05))
        for _ in range(3)
    ]
    d = _run_both(blocks, k)
    assert len(d) > 0


def test_raw_equals_dedup_with_duplicates(rng):
    k = 21
    # heavy duplication: few distinct reads repeated across blocks
    base = make_reads(rng, 8, 40, 60)
    blocks = [reads_to_block(base * 6) for _ in range(2)]
    _run_both(blocks, k)


def test_raw_budget_collapse_path(rng):
    k = 21
    blocks = [reads_to_block(genome_reads(rng, 600, 50, 40, 80)) for _ in range(4)]
    # budget of 1 byte: every push collapses into the split LSM
    da = _run_both(blocks, k, raw_budget=1)
    ref = KmerCountStore(k, raw_lsm=False)
    for blk in blocks:
        ref.add_reads_block(*blk)
    assert da == _final_dict(ref)


def test_raw_with_ctg_pass(rng):
    k = 21
    blocks = [reads_to_block(genome_reads(rng, 500, 80, 40, 80))]
    # contigs from a separate read set, with depths
    ctg_reads = genome_reads(rng, 500, 10, 60, 100)
    codes, _, lens = reads_to_block(ctg_reads)
    depths = np.asarray(rng.integers(1, 30, len(ctg_reads)), np.int32)
    _run_both(blocks, k, ctg_blocks=[(codes, lens, depths)])


def test_raw_layout_dispatch():
    # k=63: 2k=126 bits in weff=4 lanes leaves 2 free bits < 7 -> payload
    # rides a separate lane; k=21 folds it into the key bits
    assert not KmerCountStore(63, raw_lsm=True)._raw_packed
    assert KmerCountStore(21, raw_lsm=True)._raw_packed


def test_raw_budget_collapse_sep_layout(rng):
    k = 63
    blocks = [reads_to_block(genome_reads(rng, 600, 40, k + 5, 110)) for _ in range(3)]
    da = _run_both(blocks, k, raw_budget=1)
    ref = KmerCountStore(k, raw_lsm=False)
    for blk in blocks:
        ref.add_reads_block(*blk)
    assert da == _final_dict(ref)


@pytest.mark.parametrize("sizes", [(300, 700), (1000, 1000), (256, 256), (513, 1)])
def test_merge_sorted_lanes_padded(rng, sizes):
    from mhm2_proxy_tpu.ops.pallas_sort import merge_sorted_lanes_padded

    A, B = sizes
    mk = lambda n: np.sort(rng.integers(0, 1 << 32, n, dtype=np.int64).astype(np.uint32))
    a0, b0 = mk(A), mk(B)
    a = (a0, (a0 >> 3).astype(np.uint32))
    b = (b0, (b0 >> 3).astype(np.uint32))
    out = merge_sorted_lanes_padded(a, b, kw=1, interpret=True)
    got = np.asarray(out[0])
    want = np.sort(np.concatenate([a0, b0]))
    assert got.shape[0] == A + B
    np.testing.assert_array_equal(got, want)
    # the carried lane stays paired with its key
    np.testing.assert_array_equal(np.asarray(out[1]), want >> 3)


def test_merge_raw_runs_tree(rng):
    k = 21
    blocks = [reads_to_block(make_reads(rng, 30, 40, 60)) for _ in range(5)]
    runs = [C.block_to_raw_run(*[np.asarray(x) for x in blk], k) for blk in blocks]
    merged = C.merge_raw_runs(runs)
    cat = np.sort(
        np.stack([np.concatenate([np.asarray(r[i]) for r in runs]) for i in range(len(runs[0]))], 1).view(
            [("a", np.uint32), ("b", np.uint32)]
        ).reshape(-1),
        order=("a", "b"),
    )
    got = np.stack([np.asarray(x) for x in merged], 1).view(
        [("a", np.uint32), ("b", np.uint32)]
    ).reshape(-1)
    np.testing.assert_array_equal(got["a"], cat["a"])
    np.testing.assert_array_equal(got["b"], cat["b"])


def test_ranged_finalize_equals_plain(rng):
    """The range-partitioned final fold (HBM governance at arctic scale)
    must produce a bit-identical table to the monolithic fold, both with
    and without the ctg second pass (purge=True/False paths)."""
    import numpy as np
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.ops.bitkmer import ascii_to_codes
    from tests.test_count import reads_to_block

    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=3000))
    reads = []
    for _ in range(600):
        s = int(rng.integers(0, 3000 - 64))
        reads.append((genome[s : s + 64], chr(33 + 38) * 64))
    codes, qual_ok, lens = reads_to_block(reads, B=640, L=64)
    ctg = genome[500:1500]
    ccodes = np.full((8, 1024), 4, np.uint8)
    clens = np.zeros(8, np.int32)
    cdeps = np.zeros(8, np.int32)
    ccodes[0, : len(ctg)] = ascii_to_codes(ctg.encode())
    clens[0] = len(ctg)
    cdeps[0] = 6

    def run(ranged, with_ctg):
        st = KmerCountStore(k, raw_lsm=True)
        if ranged:
            st.RANGED_FOLD_MIN_ROWS = 0
            st.RANGED_FOLD_TARGET_ROWS = 4096  # force several ranges
        # several blocks + a forced collapse so finalize sees the MIXED
        # path (split runs + raw remainder)
        for s0 in range(0, 640, 160):
            st.add_reads_block(codes[s0:s0+160], qual_ok[s0:s0+160], lens[s0:s0+160])
            if s0 == 160:
                st._collapse_raw()
        if with_ctg:
            st.add_ctgs_block(ccodes, clens, cdeps)
        return st.finalize().to_host_dict()

    for with_ctg in (False, True):
        a = run(False, with_ctg)
        b = run(True, with_ctg)
        assert a == b, f"with_ctg={with_ctg}: {len(a)} vs {len(b)} entries"


@pytest.mark.parametrize("sizes", [(3000, 1800), (2100, 60), (512, 512), (5000, 3100)])
def test_merge_sorted_lanes_virtual_tiles(rng, sizes, monkeypatch):
    """Non-pow2 tile counts: physical rows pad only to a TILE boundary and
    the pow2 tail is VIRTUAL (all-sentinel tiles, never materialized). A
    shrunken TILE exercises multi-tile cross stages incl. skipped identity
    stages and per-tile virtual-partner passthrough."""
    import mhm2_proxy_tpu.ops.pallas_sort as PS

    monkeypatch.setattr(PS, "TILE", 512)
    A, B = sizes
    mk = lambda n: np.sort(rng.integers(0, 1 << 20, n, dtype=np.int64).astype(np.uint32))
    a0, b0 = mk(A), mk(B)
    a = (a0, (a0 ^ 0x5A5A).astype(np.uint32))
    b = (b0, (b0 ^ 0x5A5A).astype(np.uint32))
    out = PS.merge_sorted_lanes_padded.__wrapped__(a, b, kw=1, interpret=True)
    got = np.asarray(out[0])
    want = np.sort(np.concatenate([a0, b0]))
    assert got.shape[0] == A + B
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(np.asarray(out[1]), want ^ 0x5A5A)


def test_merge_sorted_lanes_tiled_pad_fill(rng, monkeypatch):
    """slice_out=False contract: TILE-aligned physical rows returned, the
    trailing pads carry all-ones keys and the declared pad_fill lane (the
    sort-join tags pads for its back-route compaction this way)."""
    import mhm2_proxy_tpu.ops.pallas_sort as PS

    monkeypatch.setattr(PS, "TILE", 512)
    A, B = 700, 500  # total 1200 -> P = 3*512 = 1536, M = 2048
    mk = lambda n: np.sort(rng.integers(0, 1 << 20, n, dtype=np.int64).astype(np.uint32))
    a0, b0 = mk(A), mk(B)
    a = (a0, (a0 >> 3).astype(np.uint32))
    b = (b0, (b0 >> 3).astype(np.uint32))
    out = PS.merge_sorted_lanes_tiled.__wrapped__(
        a, b, kw=1, pad_fill=(0xABC,), interpret=True
    )
    total = A + B
    assert out[0].shape[0] == 1536
    want = np.sort(np.concatenate([a0, b0]))
    np.testing.assert_array_equal(np.asarray(out[0])[:total], want)
    np.testing.assert_array_equal(np.asarray(out[1])[:total], want >> 3)
    assert (np.asarray(out[0])[total:] == 0xFFFFFFFF).all()
    assert (np.asarray(out[1])[total:] == 0xABC).all()


def test_deferred_cascade_equals_plain(rng):
    """cascade_max_rows cap: collapsed runs too big to pairwise-merge are
    DEFERRED as sibling runs until the finalize fold (the arctic-scale HBM
    peak was the mid-round cascade merge of two collapsed runs). Forcing
    the cap to its floor must leave the final table bit-identical."""
    k = 21
    blocks = [reads_to_block(genome_reads(rng, 900, 60, k + 5, 120))
              for _ in range(4)]
    a = KmerCountStore(k, raw_lsm=True, raw_budget_bytes=1)
    a.cascade_max_rows = 1  # defer EVERY cascade merge
    b = KmerCountStore(k, raw_lsm=False)
    for blk in blocks:
        a.add_reads_block(*blk)
        b.add_reads_block(*blk)
    assert len(a.runs) >= 3, "cap did not defer the cascade"
    da, db = _final_dict(a), _final_dict(b)
    assert da == db


@pytest.mark.parametrize("tiles_a,tiles_b", [(560, 560), (3, 2), (96, 32)])
def test_merge_exact_tile_multiple_nonpow2(rng, tiles_a, tiles_b, monkeypatch):
    """pad == 0 at a NON-pow2 tile count: the merge layout must still be
    down-up (reversed(b), a) — up-down plus the network's virtual +inf tail
    is up-down-up, not bitonic, and silently produced UNSORTED merges at
    the arctic collapse's exact 1120-tile shape (36,700,160 rows), leaving
    ~12M duplicate keys in the k=21 table."""
    import mhm2_proxy_tpu.ops.pallas_sort as PS

    monkeypatch.setattr(PS, "TILE", 512)
    A, B = tiles_a * 512 // 2 * 2, tiles_b * 512
    A = tiles_a * 512 - tiles_b * 512 // 2
    B = tiles_b * 512 // 2  # total = exact tile multiple, non-pow2 count
    total = A + B
    assert total % 512 == 0 and (total // 512) & (total // 512 - 1) != 0
    mk = lambda n: np.sort(rng.integers(0, 1 << 32, n, dtype=np.int64).astype(np.uint32))
    a0, b0 = mk(A), mk(B)
    a = (a0, (a0 ^ 0xBEEF).astype(np.uint32))
    b = (b0, (b0 ^ 0xBEEF).astype(np.uint32))
    for fn in (PS.merge_sorted_lanes_padded, PS.merge_sorted_lanes):
        out = fn.__wrapped__(a, b, kw=1, interpret=True)
        want = np.sort(np.concatenate([a0, b0]))
        np.testing.assert_array_equal(np.asarray(out[0]), want)
        np.testing.assert_array_equal(np.asarray(out[1]), want ^ 0xBEEF)
