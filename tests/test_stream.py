"""Streaming ingest: bounded memory, chunk/slurp equivalence, byte ranges."""

import gzip

import numpy as np
import pytest

from mhm2_proxy_tpu.io.fastq import FastqReader, write_fastq
from mhm2_proxy_tpu.io.stream import FastqStream, stream_fastq_blocks, _last_record_end
from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads


@pytest.fixture
def fastq_file(tmp_path, rng):
    genome = random_genome(rng, 4000)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=12.0, read_len=72, err_rate=0.01)
    f = str(tmp_path / "reads.fastq")
    write_fastq(f, ids, seqs, quals)
    return f, seqs, quals


def _collect(blocks):
    seqs = []
    lut = np.frombuffer(b"ACGTN", np.uint8)
    for c, q, l, n in blocks:
        for i in range(n):
            seqs.append(lut[c[i, : l[i]]].tobytes().decode())
    return seqs


def test_stream_equals_slurp(fastq_file):
    f, seqs, quals = fastq_file
    got = _collect(stream_fastq_blocks(f, 64, chunk_bytes=1 << 12))
    assert got == [s if isinstance(s, str) else s.decode() for s in seqs]


def test_stream_bounded_memory(fastq_file):
    """Peak buffering stays ~2 chunks even when the file is much larger."""
    f, seqs, _ = fastq_file
    chunk = 1 << 12  # 4 KiB chunks over a ~1 MiB file
    st = FastqStream(f, chunk_bytes=chunk)
    n = sum(b[3] for b in stream_fastq_blocks(f, 64, chunk_bytes=chunk, stream=st))
    assert n == len(seqs)
    assert st.max_buffered <= 3 * chunk


def test_stream_gzip(fastq_file, tmp_path):
    f, seqs, _ = fastq_file
    gz = str(tmp_path / "reads.fastq.gz")
    with open(f, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    got = _collect(stream_fastq_blocks(gz, 64, chunk_bytes=1 << 12))
    assert len(got) == len(seqs)


def test_byte_ranges_partition_exactly(fastq_file):
    """Every record lands in exactly one range, matching FastqReader."""
    f, seqs, _ = fastq_file
    import os

    size = os.path.getsize(f)
    n_ranges = 5
    all_got = []
    for r in range(n_ranges):
        lo = size * r // n_ranges
        hi = size * (r + 1) // n_ranges
        got = _collect(
            stream_fastq_blocks(f, 64, chunk_bytes=1 << 12, byte_range=(lo, hi))
        )
        # must equal the (whole-file) FastqReader's view of the same range
        ref = FastqReader(f, rank=r, n_ranks=n_ranges)
        assert got == [s.decode() for s in ref.seqs], f"range {r}"
        all_got += got
    assert all_got == [s if isinstance(s, str) else s.decode() for s in seqs]


def test_last_record_end():
    rec = b"@r1\nACGT\n+\nIIII\n"
    assert _last_record_end(rec * 3) == len(rec) * 3
    assert _last_record_end(rec * 3 + b"@r4\nAC") == len(rec) * 3
    assert _last_record_end(b"@r1\nACGT\n") == 0


def test_assembler_streaming_load(tmp_path, rng):
    """Assembler.load_reads over streams == direct block feeding."""
    from mhm2_proxy_tpu.models import Assembler, AssemblerConfig

    genome = random_genome(rng, 1500)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=8.0, read_len=70, err_rate=0.0)
    if len(seqs) % 2:
        ids, seqs, quals = ids[:-1], seqs[:-1], quals[:-1]
    f = str(tmp_path / "il.fastq")
    write_fastq(f, ids, seqs, quals)

    a1 = Assembler(AssemblerConfig(block_reads=32, chunk_bytes=1 << 12))
    a1.load_reads([f])
    a2 = Assembler(AssemblerConfig(block_reads=32))
    a2.add_interleaved(seqs, quals)

    # block-size-dependent ordering of unmerged mates is allowed; the packed
    # read MULTISET must be identical
    def reads_of(asm):
        lut = np.frombuffer(b"ACGTN", np.uint8)
        out = []
        for c, q, l in asm.packed_reads.blocks(64):
            for i in range(c.shape[0]):
                if l[i]:
                    out.append(
                        (lut[c[i, : l[i]]].tobytes(), q[i, : l[i]].tobytes())
                    )
        return sorted(out)

    assert reads_of(a1) == reads_of(a2)
