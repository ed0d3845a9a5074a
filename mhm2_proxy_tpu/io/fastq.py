"""FASTQ ingest: vectorized parsing with byte-range partitioning.

Replaces the reference's FastqReader (src/fastq.cpp): the whole file (or a
rank's byte range) is loaded and parsed with numpy newline indexing instead of
per-record getline loops. Record-boundary resync for mid-file byte ranges
mirrors the reference's state machine (fastq.cpp:124-238): scan forward for an
'@' header line whose +2 line is '+', validating the 4-line phase.

Supports plain and gzip files, paired two-file inputs ("f1:f2" naming like
options.cpp:315-335) and interleaved single files.
"""

from __future__ import annotations

import gzip
import io

import numpy as np


def _open(fname: str):
    if fname.endswith(".gz"):
        return gzip.open(fname, "rb")
    return open(fname, "rb")


def _resync_offset(buf: bytes, start: int) -> int:
    """First record boundary at/after start (reference fastq.cpp:124-238).

    A boundary is a line starting with '@' such that the line two lines later
    starts with '+' (quality headers can also start with '@', so a lone '@' is
    not sufficient).
    """
    if start == 0:
        return 0
    pos = buf.find(b"\n", start)
    if pos < 0:
        return len(buf)
    pos += 1
    # try up to 4 line offsets to find the header phase
    cand = pos
    for _ in range(8):
        if cand >= len(buf):
            return len(buf)
        if buf[cand : cand + 1] == b"@":
            # check that line cand+2 starts with '+'
            e1 = buf.find(b"\n", cand)
            if e1 < 0:
                return len(buf)
            e2 = buf.find(b"\n", e1 + 1)
            if e2 < 0:
                return len(buf)
            if buf[e2 + 1 : e2 + 2] == b"+":
                return cand
        nxt = buf.find(b"\n", cand)
        if nxt < 0:
            return len(buf)
        cand = nxt + 1
    return cand


def parse_fastq_bytes(buf: bytes):
    """Parse FASTQ bytes -> (ids list[bytes], seqs list[bytes], quals list[bytes]).

    Vectorized: newline positions via numpy, then slicing.
    """
    arr = np.frombuffer(buf, np.uint8)
    nl = np.nonzero(arr == ord("\n"))[0]
    if len(buf) and not buf.endswith(b"\n"):
        nl = np.append(nl, len(buf))
    n_lines = len(nl)
    n_rec = n_lines // 4
    starts = np.concatenate([[0], nl[:-1] + 1])[: n_rec * 4]
    ends = nl[: n_rec * 4]
    ids, seqs, quals = [], [], []
    for r in range(n_rec):
        ids.append(buf[starts[4 * r] : ends[4 * r]])
        seqs.append(buf[starts[4 * r + 1] : ends[4 * r + 1]])
        quals.append(buf[starts[4 * r + 3] : ends[4 * r + 3]])
    return ids, seqs, quals


class FastqReader:
    """Reads a byte range of a FASTQ file with boundary resync.

    rank/n_ranks partition the file by bytes like the reference
    (fastq.cpp:263-276, 399-455); each rank parses [resync(lo), resync(hi)).
    """

    def __init__(self, fname: str, rank: int = 0, n_ranks: int = 1):
        self.fname = fname
        with _open(fname) as f:
            data = f.read()
        size = len(data)
        lo = size * rank // n_ranks
        hi = size * (rank + 1) // n_ranks
        lo = _resync_offset(data, lo)
        hi = _resync_offset(data, hi) if hi < size else size
        self.ids, self.seqs, self.quals = parse_fastq_bytes(data[lo:hi])

    def __len__(self):
        return len(self.seqs)


def read_fastq(fname: str, rank: int = 0, n_ranks: int = 1):
    r = FastqReader(fname, rank, n_ranks)
    return r.ids, r.seqs, r.quals


def write_fastq(fname: str, ids, seqs, quals):
    out = io.BytesIO()
    for i, s, q in zip(ids, seqs, quals):
        i = i if isinstance(i, bytes) else i.encode()
        s = s if isinstance(s, bytes) else s.encode()
        q = q if isinstance(q, bytes) else q.encode()
        out.write(b"@" + i.lstrip(b"@") + b"\n" + s + b"\n+\n" + q + b"\n")
    opener = gzip.open if fname.endswith(".gz") else open
    with opener(fname, "wb") as f:
        f.write(out.getvalue())


def split_paired_fname(reads_fname: str):
    """'f1:f2' paired naming (reference options.cpp:315-335) -> (f1, f2|None)."""
    if ":" in reads_fname:
        a, b = reads_fname.split(":", 1)
        return a, b
    return reads_fname, None
