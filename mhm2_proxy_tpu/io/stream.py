"""Bounded-memory streaming FASTQ ingest.

The reference never slurps inputs: each rank streams its byte range with
fadvise hints (src/fastq.cpp:457-475) so terabase inputs ingest in constant
memory. This module replaces the round-1 whole-file read with a chunked
stream: raw or gzip files are read in `chunk_bytes` pieces, cut at record
boundaries, parsed (native C++ parser when available), and re-batched into
uniform `block_reads`-row blocks. Peak buffering is ~2 chunks + 1 block
regardless of file size.

Byte ranges (multi-host ingest, fastq.cpp:399-455) are supported for raw
files: the stream resyncs its start to the next record boundary and owns
every record that *starts* before `hi` (reading past `hi` only to finish the
last record), so ranges partition the file exactly.
"""

from __future__ import annotations

import gzip

import numpy as np

from .fastq import _resync_offset, parse_fastq_bytes


def _last_record_end(buf: bytes) -> int:
    """Byte offset just past the last complete 4-line record in buf.

    Assumes buf starts at a record boundary (guaranteed by resync/cutting).
    """
    arr = np.frombuffer(buf, np.uint8)
    nl = np.nonzero(arr == ord("\n"))[0]
    nrec = len(nl) // 4
    if nrec == 0:
        return 0
    return int(nl[4 * nrec - 1]) + 1


class FastqStream:
    """Chunked record-complete byte stream over a FASTQ file (or byte range)."""

    def __init__(self, fname: str, chunk_bytes: int = 8 << 20,
                 byte_range: tuple[int, int] | None = None):
        self.fname = fname
        self.chunk_bytes = int(chunk_bytes)
        self.byte_range = byte_range
        self.max_buffered = 0  # bounded-memory accounting for tests
        if byte_range is not None and fname.endswith(".gz"):
            raise ValueError("byte ranges require an uncompressed file")

    def _resync_at(self, buf: bytes, pos: int) -> int:
        """First record boundary in buf scanning from pos, with FastqReader's
        exact semantics even at pos 0 (a leading sentinel byte defeats the
        start==0 shortcut so range endpoints partition the file precisely)."""
        return _resync_offset(b"x" + buf, pos + 1) - 1

    def chunks(self):
        gz = self.fname.endswith(".gz")
        f = gzip.open(self.fname, "rb") if gz else open(self.fname, "rb")
        try:
            lo, hi = self.byte_range or (0, None)
            tail = b""
            consumed = lo  # raw-file offset just past all bytes read so far
            if lo:
                f.seek(lo)
                # resync the start to the next record boundary after lo
                probe = f.read(self.chunk_bytes)
                consumed += len(probe)
                start = self._resync_at(probe, 0)
                while start >= len(probe) and len(probe) < (hi or 1 << 62) - lo:
                    more = f.read(self.chunk_bytes)
                    if not more:
                        break
                    probe += more
                    consumed += len(more)
                    start = self._resync_at(probe, 0)
                tail = probe[start:] if start < len(probe) else b""
            while True:
                buf_start = consumed - len(tail)  # file offset of tail/buf[0]
                data = f.read(self.chunk_bytes)
                eof = not data
                buf = tail + data
                consumed += len(data)
                self.max_buffered = max(self.max_buffered, len(buf))
                if hi is not None and consumed >= hi:
                    # own every record STARTING before hi: cut at the first
                    # boundary at/after hi, extending the buffer if the
                    # boundary (or the final record) runs past it
                    keep = hi - buf_start
                    while True:
                        b = self._resync_at(buf, max(keep, 0))
                        if b < len(buf) or eof:
                            break
                        data = f.read(self.chunk_bytes)
                        eof = not data
                        buf += data
                        consumed += len(data)
                        self.max_buffered = max(self.max_buffered, len(buf))
                    if b > 0:
                        yield buf[:b]
                    return
                cut = len(buf) if eof else _last_record_end(buf)
                if cut:
                    yield buf[:cut]
                if eof:
                    return
                tail = buf[cut:]
        finally:
            f.close()


class _Rebatcher:
    """Accumulate parsed row groups; emit uniform (block_reads, L) blocks."""

    def __init__(self, block_reads: int, pad_quantum: int, qual_offset: int):
        self.B = block_reads
        self.q = pad_quantum
        self.qoff = qual_offset
        self.groups: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self.rows = 0

    def add(self, codes, quals, lens):
        self.groups.append((codes, quals, lens))
        self.rows += codes.shape[0]

    def _emit(self, n: int):
        L = max(int(max(g[0].shape[1] for g in self.groups)), self.q)
        L = (L + self.q - 1) // self.q * self.q
        out_c = np.full((self.B, L), 4, np.uint8)
        out_q = np.full((self.B, L), self.qoff, np.uint8)
        out_l = np.zeros((self.B,), np.int32)
        cur = 0
        rest: list[tuple] = []
        for c, q, l in self.groups:
            if cur >= n:
                rest.append((c, q, l))
                continue
            take = min(c.shape[0], n - cur)
            out_c[cur : cur + take, : c.shape[1]] = c[:take]
            out_q[cur : cur + take, : q.shape[1]] = q[:take]
            out_l[cur : cur + take] = l[:take]
            cur += take
            if take < c.shape[0]:
                rest.append((c[take:], q[take:], l[take:]))
        self.groups = rest
        self.rows -= n
        return out_c, out_q, out_l, n

    def full_blocks(self):
        while self.rows >= self.B:
            yield self._emit(self.B)

    def flush(self):
        if self.rows > 0:
            yield self._emit(self.rows)


def stream_fastq_blocks(fname: str, block_reads: int, pad_quantum: int = 32,
                        qual_offset: int = 33, chunk_bytes: int = 8 << 20,
                        byte_range: tuple[int, int] | None = None,
                        stream: FastqStream | None = None):
    """Yield (codes (B,L) u8, quals (B,L) u8, lens (B,) i32, n) blocks.

    Exactly `block_reads` rows per block (last block partial, n < B), with
    bounded memory: ~2 chunks + 1 block live at any time. Drop-in equivalent
    of the round-1 whole-buffer parse (identical blocks modulo padding width).
    """
    from . import native

    st = stream or FastqStream(fname, chunk_bytes, byte_range)
    rb = _Rebatcher(block_reads, pad_quantum, qual_offset)
    use_native = native.native_available()
    for chunk in st.chunks():
        if use_native:
            cnt, maxlen = native.scan(chunk)
            if cnt == 0:
                continue
            L = max((maxlen + pad_quantum - 1) // pad_quantum * pad_quantum, pad_quantum)
            for c, q, l, n in native.parse_blocks(chunk, block_reads, L, qual_pad=qual_offset):
                rb.add(c[:n], q[:n], l[:n])
        else:
            ids, seqs, quals = parse_fastq_bytes(chunk)
            if not seqs:
                continue
            from ..models.assembler import _lists_to_block

            c, q, l = _lists_to_block(seqs, quals, pad_quantum, qual_offset)
            rb.add(c, q, l)
        yield from rb.full_blocks()
    yield from rb.flush()
