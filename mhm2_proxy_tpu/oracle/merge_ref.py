"""Sequential Python mirror of the reference pair-merge algorithm.

Follows src/merge_reads.cpp:307-495 step by step (with the same pre-zeroed
N-quality convention as io/merge.py — see its docstring for why this is
equivalent for assembly). Used only as a test oracle for the batched device
implementation.
"""

from __future__ import annotations

from .pyref import revcomp_str
from ..io.merge import _Q2PERROR, MIN_OVERLAP, EXTRA_TEST_OVERLAP, MAX_MISMATCHES, MAX_PERROR, EXTRA_MISMATCHES_PER_1000
import numpy as np


def merge_pair_oracle(seq1: str, quals1: str, seq2: str, quals2: str, qual_offset: int = 33):
    """Returns (merged: bool, m_seq, m_quals) mirroring the reference scan."""
    q1 = [max(ord(c) - qual_offset, 0) if b != "N" else 0 for c, b in zip(quals1, seq1)]
    rc2 = revcomp_str(seq2)
    q2 = [max(ord(c) - qual_offset, 0) if b != "N" else 0 for c, b in zip(quals2[::-1], rc2)]
    s1 = list(seq1)

    ln = min(len(rc2), len(seq1))
    start_i = len(seq1) - ln

    best_i = -1
    found_i = -1
    abort_merge = False

    for i in range(0, ln - MIN_OVERLAP + EXTRA_TEST_OVERLAP):
        if abort_merge:
            break
        overlap = ln - i
        this_max = MAX_MISMATCHES + (EXTRA_MISMATCHES_PER_1000 * overlap) // 1000
        error_max = (this_max * 4) // 3 + 1
        byte_mm = sum(1 for jj in range(overlap) if s1[start_i + i + jj] != rc2[jj])
        if byte_mm > error_max:
            continue
        matches = mismatches = both_ns = ncount = 0
        checked = 0
        perror = 0.0
        for jj in range(overlap):
            checked += 1
            ps = s1[start_i + i + jj]
            rs = rc2[jj]
            if ps == rs:
                matches += 1
                if ps == "N":
                    ncount += 2
                    if both_ns:
                        abort_merge = True
                        break
                    both_ns += 1
            else:
                mismatches += 1
                if ps == "N":
                    mismatches += 1
                    ncount += 1
                    perror += _Q2PERROR[q2[jj]]
                elif rs == "N":
                    mismatches += 1
                    ncount += 1
                    perror += _Q2PERROR[q1[start_i + i + jj]]
                diffq = abs(q1[start_i + i + jj] - q2[jj])
                if diffq <= 2:
                    perror += 0.5
                else:
                    perror += _Q2PERROR[diffq]
            if ncount > 3:
                abort_merge = True
                break
            if mismatches > error_max:
                break
        match_thres = max(overlap - this_max, MIN_OVERLAP)
        if (
            matches >= match_thres
            and checked == overlap
            and mismatches <= this_max
            and np.float32(perror) / np.float32(overlap) <= np.float32(MAX_PERROR)
        ):
            if best_i < 0 and found_i < 0:
                best_i = i
            else:
                best_i = -1
                break
        elif (
            checked == overlap
            and mismatches <= error_max
            and np.float32(perror) / np.float32(overlap) <= np.float32(MAX_PERROR * 4 / 3)
        ):
            found_i = i
            if best_i >= 0:
                best_i = -1
                break

    if best_i < 0 or abort_merge:
        return False, None, None

    i = best_i
    overlap = ln - i
    out_q = q1[:]
    for jj in range(overlap):
        p = start_i + i + jj
        if s1[p] == rc2[jj]:
            out_q[p] = min(q1[p] + q2[jj], 41)
        else:
            if q1[p] < q2[jj]:
                s1[p] = rc2[jj]
            out_q[p] = max(abs(q1[p] - q2[jj]), 2)
    m_seq = "".join(s1[: start_i + i + overlap]) + rc2[overlap:]
    m_q = out_q[: start_i + i + overlap] + q2[overlap:]
    m_quals = "".join(chr(q + qual_offset) for q in m_q)
    return True, m_seq, m_quals
