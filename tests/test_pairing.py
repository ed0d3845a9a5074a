"""Ingest parity: header normalization, pair validation, pair-aligned
two-file byte ranges, read identity, merged-checkpoint round-trip.

Reference behaviors mirrored: get_fq_name (fastq.cpp:73-122),
set_matching_pair (fastq.cpp:310-396), mate-name DIE (merge_reads.cpp:
346-348), signed int64 read ids (packed_reads.cpp:74-75, id blocks
merge_reads.cpp:258-260,306-329).
"""

import numpy as np
import pytest

from mhm2_proxy_tpu.io.fastq import (
    check_pair_block,
    headers_from_chunk,
    normalize_fq_name,
    parse_rid_headers,
    render_fastq_block,
    write_fastq,
)
from mhm2_proxy_tpu.io.stream import matching_pair_ranges, stream_fastq_blocks
from mhm2_proxy_tpu.models.assembler import Assembler, AssemblerConfig
from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads


def test_normalize_fq_name_formats():
    # classic /1 /2
    assert normalize_fq_name(b"@read7/1") == (b"read7", 1)
    assert normalize_fq_name(b"@read7/2") == (b"read7", 2)
    # classic with comment
    assert normalize_fq_name(b"@read7/1 len=100") == (b"read7", 1)
    # HudsonAlpha @pair-R1 (base drops the separator too)
    assert normalize_fq_name(b"@pair-R1") == (b"pair", 1)
    assert normalize_fq_name(b"@pair-R2") == (b"pair", 2)
    # new Illumina: pair in the comment, colon structure validated
    assert normalize_fq_name(b"@M00:8:FC:1:2106:15647:1063 1:N:0:ATCACG") == (
        b"M00:8:FC:1:2106:15647:1063", 1)
    assert normalize_fq_name(b"@M00:8:FC:1:2106:15647:1063 2:N:0:ATCACG") == (
        b"M00:8:FC:1:2106:15647:1063", 2)
    # tab separator
    assert normalize_fq_name(b"@name\t1:N:0:G") == (b"name", 1)
    # no designator at all
    assert normalize_fq_name(b"@lonely") == (b"lonely", 0)
    # unknown formats -> None (reference SWARN/DIE path)
    assert normalize_fq_name(b"@x some comment") is None
    assert normalize_fq_name(b"garbage") is None
    # trailing whitespace trimmed (reference rtrim)
    assert normalize_fq_name(b"@a/1 \r") == (b"a", 1)


def _hdrs(*names):
    chunk = b"".join(b"@" + n + b"\nACGT\n+\nIIII\n" for n in names)
    return headers_from_chunk(chunk)


def test_check_pair_block_accepts_mates_rejects_mismatch():
    m1, l1 = _hdrs(b"a/1", b"b/1 c", b"x:y 1:N:0:A", b"p-R1")
    m2, l2 = _hdrs(b"a/2", b"b/2 c", b"x:y 2:N:0:A", b"p-R2")
    assert check_pair_block(m1, l1, m2, l2) == -1
    # swapped mate order is a mismatch (first offending row reported)
    assert check_pair_block(m2, l2, m1, l1) == 0
    # different base names
    m3, l3 = _hdrs(b"a/2", b"ZZ/2 c", b"x:y 2:N:0:A", b"p-R2")
    assert check_pair_block(m1, l1, m3, l3) == 1
    # designator-free but identical names pass
    m4, l4 = _hdrs(b"same", b"same2")
    assert check_pair_block(m4, l4, m4, l4) == -1


def _write_pair_files(tmp_path, n=400, vary=True):
    rng = np.random.default_rng(3)
    f1, f2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    names = [f"read{i:05d}" for i in range(n)]
    with open(f1, "w") as a, open(f2, "w") as b:
        for i, nm in enumerate(names):
            L1 = 60 + (i % 3) * 12 if vary else 80  # different record byte sizes
            s1 = "".join(rng.choice(list("ACGT"), L1))
            s2 = "".join(rng.choice(list("ACGT"), 100))
            a.write(f"@{nm}/1\n{s1}\n+\n{'I' * len(s1)}\n")
            b.write(f"@{nm}/2\n{s2}\n+\n{'I' * len(s2)}\n")
    return f1, f2, names


def test_matching_pair_ranges_partition_and_align(tmp_path):
    f1, f2, names = _write_pair_files(tmp_path)

    def headers(f, br):
        out = []
        for blk in stream_fastq_blocks(f, 64, byte_range=br, with_ids=True):
            hm, hl = blk[4]
            out += [bytes(hm[i][: hl[i]]) for i in range(blk[3])]
        return out

    all1 = []
    for r in range(5):
        br1, br2 = matching_pair_ranges(f1, f2, r, 5)
        h1, h2 = headers(f1, br1), headers(f2, br2)
        # same record count per rank and same-ordinal records are mates
        assert len(h1) == len(h2)
        for a, b in zip(h1, h2):
            assert a.rsplit(b"/", 1)[0] == b.rsplit(b"/", 1)[0]
        all1 += h1
    # ranges partition file1 exactly: every record once, in order
    assert [h[1:].split(b"/")[0].decode() for h in all1] == names


def test_multiprocess_two_file_equals_single(tmp_path):
    """Union of per-rank two-file ingests == single-rank ingest (the VERDICT
    r2 trust gap: same-ordinal != mates under naive same-range splits)."""
    f1, f2, _ = _write_pair_files(tmp_path, n=300)
    cfg = AssemblerConfig(kmer_lens=(21,), block_reads=256)
    single = Assembler(cfg)
    single.load_reads([f"{f1}:{f2}"])

    def read_set(asm):
        out = []
        for c, q, l in asm.packed_reads.blocks(256):
            for i in range(c.shape[0]):
                if l[i]:
                    out.append(bytes(c[i, : l[i]]))
        return sorted(out)

    parts = []
    for r in range(3):
        a = Assembler(cfg)
        a.load_reads([f"{f1}:{f2}"], rank=r, n_ranks=3)
        parts += read_set(a)
    assert sorted(parts) == read_set(single)


def test_mispaired_input_dies_loudly(tmp_path):
    f1 = str(tmp_path / "a1.fq")
    f2 = str(tmp_path / "a2.fq")
    write_fastq(f1, [b"p0/1", b"p1/1"], ["A" * 50, "C" * 50], ["I" * 50] * 2)
    # second file has a shuffled mate
    write_fastq(f2, [b"p1/2", b"p0/2"], ["G" * 50, "T" * 50], ["I" * 50] * 2)
    asm = Assembler(AssemblerConfig(kmer_lens=(21,), block_reads=64))
    with pytest.raises(ValueError, match="mis-paired"):
        asm.load_reads([f"{f1}:{f2}"])
    # truncated second file also dies
    f3 = str(tmp_path / "a3.fq")
    write_fastq(f3, [b"p0/2"], ["G" * 50], ["I" * 50])
    asm = Assembler(AssemblerConfig(kmer_lens=(21,), block_reads=64))
    with pytest.raises(ValueError):
        asm.load_reads([f"{f1}:{f3}"])


def test_read_ids_assigned_and_disjoint(tmp_path):
    rng = np.random.default_rng(5)
    genome = random_genome(rng, 4000)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=8.0, read_len=90)
    fq = str(tmp_path / "i.fastq")
    write_fastq(fq, ids, seqs, quals)
    a0 = Assembler(AssemblerConfig(block_reads=128))
    a0.load_reads([fq], rank=0, n_ranks=2)
    a1 = Assembler(AssemblerConfig(block_reads=128))
    a1.load_reads([fq], rank=1, n_ranks=2)
    s0, s1 = a0.packed_reads.id_span(), a1.packed_reads.id_span()
    assert s0 is not None and s1 is not None
    # process stride keeps id blocks disjoint (merge_reads.cpp:258-260 role)
    assert s0[1] < s1[0]
    assert s1[0] >= Assembler.READ_ID_STRIDE
    # mate sign convention: every id nonzero; |id| shared within a pair
    for _, _, l, rid in a0.packed_reads.blocks(128, with_ids=True):
        assert (rid[l > 0] != 0).all()


def test_render_parse_roundtrip_and_merged_reload(tmp_path):
    rng = np.random.default_rng(11)
    genome = random_genome(rng, 3000)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=10.0, read_len=80,
                                      insert_mean=150)
    fq = str(tmp_path / "r.fastq")
    write_fastq(fq, ids, seqs, quals)
    asm = Assembler(AssemblerConfig(block_reads=256))
    asm.load_reads([fq])
    ck = str(tmp_path / "reads-merged.fastq.gz")
    asm.dump_merged_reads(ck)

    re = Assembler(AssemblerConfig(block_reads=256))
    re.load_merged_reads(ck)
    assert len(re.packed_reads) == len(asm.packed_reads)
    assert re.packed_reads.total_bases == asm.packed_reads.total_bases

    def rows(a):
        out = []
        for c, q, l, rid in a.packed_reads.blocks(256, with_ids=True):
            for i in range(c.shape[0]):
                if l[i]:
                    out.append((int(rid[i]), bytes(c[i, : l[i]]), bytes(q[i, : l[i]])))
        return sorted(out)

    assert rows(re) == rows(asm)


def test_render_fastq_block_matches_naive():
    codes = np.array([[0, 1, 2, 3, 4], [3, 3, 3, 3, 3], [0, 0, 0, 0, 0]], np.uint8)
    quals = np.tile(np.arange(33, 38, dtype=np.uint8), (3, 1))
    lens = np.array([5, 2, 0])
    rid = np.array([-1, 10, 99])
    out = render_fastq_block(rid, codes, quals, lens)
    assert out == b"@r1/1\nACGTN\n+\n!\"#$%\n@r10/2\nTT\n+\n!\"\n"
    back = parse_rid_headers(*headers_from_chunk(out))
    assert back.tolist() == [-1, 10]
