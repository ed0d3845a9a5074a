"""GFA2 assembly-graph output.

Full MHM2 documents GFA2 graph output of the final assembly
(reference docs/mhm_guide.md:235-239). Segments are contigs; edges connect
contig ends that overlap by (k-1) bases through a fork in the de Bruijn
graph (the boundaries at which traversal stopped with an F call).
"""

from __future__ import annotations

from ..oracle.pyref import revcomp_str  # simple host helper


def _end_kmers(seq: str, k: int):
    return seq[: k - 1], seq[-(k - 1) :]


def write_gfa2(fname: str, contigs, k: int):
    """contigs: iterable of (id, seq, depth). Writes GFA2."""
    contigs = list(contigs)
    # index contig end (k-1)-mers, both orientations
    ends: dict[str, list] = {}
    for cid, seq, depth in contigs:
        if len(seq) < k:
            continue
        head, tail = _end_kmers(seq, k)
        ends.setdefault(head, []).append((cid, "head", "+"))
        ends.setdefault(tail, []).append((cid, "tail", "+"))
        ends.setdefault(revcomp_str(head), []).append((cid, "head", "-"))
        ends.setdefault(revcomp_str(tail), []).append((cid, "tail", "-"))

    lines = ["H\tVN:Z:2.0"]
    for cid, seq, depth in contigs:
        lines.append(f"S\tContig{cid}\t{len(seq)}\t{seq}\tDP:f:{depth:.3f}")

    seen = set()
    eid = 0
    for cid, seq, depth in contigs:
        if len(seq) < k:
            continue
        tail = seq[-(k - 1) :]
        # a right-fork boundary: other contigs beginning with our tail overlap
        for other_cid, end, orient in ends.get(tail, []):
            if other_cid == cid:
                continue
            key = (min(cid, other_cid), max(cid, other_cid), end, orient)
            if key in seen:
                continue
            seen.add(key)
            o_seq = next(s for c, s, d in contigs if c == other_cid)
            sid2 = f"Contig{other_cid}{orient}"
            if end == "head" and orient == "+":
                beg2, end2 = 0, k - 1
            else:
                beg2, end2 = len(o_seq) - (k - 1), len(o_seq)
            lines.append(
                f"E\te{eid}\tContig{cid}+\t{sid2}\t"
                f"{len(seq) - (k - 1)}\t{len(seq)}$\t{beg2}\t{end2}\t{k - 1}M"
            )
            eid += 1
    with open(fname, "w") as f:
        f.write("\n".join(lines) + "\n")
    return eid
