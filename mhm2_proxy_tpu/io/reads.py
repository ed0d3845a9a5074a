"""In-memory packed read storage (reference src/packed_reads.{hpp,cpp}).

Reads are stored as concatenated uint8 base codes (0-3, 4=N) plus phred
quality bytes and an offsets array — the dense-array analog of the reference's
PackedRead list (1 byte/base, packed_reads.cpp:85-107). Blocks are served as
fixed-shape padded (B, L) arrays for jitted consumption, so every batch
compiles once.
"""

from __future__ import annotations

import numpy as np

from ..ops.bitkmer import ascii_to_codes


class PackedReads:
    def __init__(self, qual_offset: int = 33):
        self.qual_offset = qual_offset
        self._codes: list[np.ndarray] = []
        self._quals: list[np.ndarray] = []
        self._lens: list[int] = []
        self.max_read_len = 0

    def add_read(self, seq: bytes | str, quals: bytes | str):
        if isinstance(seq, str):
            seq = seq.encode()
        if isinstance(quals, str):
            quals = quals.encode()
        self._codes.append(ascii_to_codes(seq))
        self._quals.append(np.frombuffer(quals, np.uint8))
        self._lens.append(len(seq))
        self.max_read_len = max(self.max_read_len, len(seq))

    def add_batch(self, codes: np.ndarray, quals: np.ndarray, lens: np.ndarray):
        """Add a padded (B, L) block of already-packed reads."""
        for i in range(len(lens)):
            n = int(lens[i])
            self._codes.append(np.asarray(codes[i, :n], np.uint8))
            self._quals.append(np.asarray(quals[i, :n], np.uint8))
            self._lens.append(n)
            self.max_read_len = max(self.max_read_len, n)

    def __len__(self):
        return len(self._lens)

    @property
    def total_bases(self):
        return int(np.sum(self._lens)) if self._lens else 0

    def blocks(self, block_reads: int, pad_len: int | None = None, min_len: int = 0):
        """Yield fixed-shape (B, L) blocks: (codes u8, qual_ok? no — quals u8, lens i32).

        Short reads (len < min_len) are padded out (len 0) rather than
        dropped so that shapes stay static. The last block is zero-padded to
        the full B.
        """
        L = pad_len or self.max_read_len
        idxs = [i for i in range(len(self._lens))]
        for s in range(0, max(len(idxs), 1), block_reads):
            chunk = idxs[s : s + block_reads]
            if not chunk and s > 0:
                break
            codes = np.full((block_reads, L), 4, np.uint8)
            quals = np.zeros((block_reads, L), np.uint8)
            lens = np.zeros((block_reads,), np.int32)
            for bi, ri in enumerate(chunk):
                n = self._lens[ri]
                if n < min_len:
                    continue
                codes[bi, :n] = self._codes[ri]
                quals[bi, :n] = self._quals[ri]
                lens[bi] = n
            yield codes, quals, lens
            if not chunk:
                break

    def qual_ok(self, quals: np.ndarray, cutoff: int = 20) -> np.ndarray:
        """phred >= cutoff mask (reference kcount.cpp:80-85)."""
        return quals >= (self.qual_offset + cutoff)
