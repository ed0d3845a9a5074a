"""GFA2 writer: oriented (k-1)-overlap edges including fork multi-edges."""

import pytest

from mhm2_proxy_tpu.io.gfa import write_gfa2
from mhm2_proxy_tpu.oracle.pyref import revcomp_str


def _edges(fname):
    out = []
    for line in open(fname).read().splitlines():
        if line.startswith("E\t"):
            f = line.split("\t")
            out.append((f[2], f[3], f[4], f[5], f[6], f[7], f[8]))
    return out


def test_fork_multi_edges(tmp_path):
    """A's tail forks into B and C (shared (k-1) prefix): TWO edges."""
    k = 5
    ov = "AACG"  # k-1 overlap
    a = "TTTTC" + ov
    b = ov + "GGATC"
    c = ov + "TTAGC"
    f = str(tmp_path / "g.gfa2")
    n = write_gfa2(f, [(0, a, 2.0), (1, b, 2.0), (2, c, 2.0)], k)
    assert n == 2
    e = _edges(f)
    assert ("Contig0+", "Contig1+", "5", "9$", "0", "4", "4M") in e
    assert ("Contig0+", "Contig2+", "5", "9$", "0", "4", "4M") in e


def test_head_head_orientation_edge(tmp_path):
    """A- -> B+ (head-to-head overlap) must be emitted exactly once."""
    k = 5
    ov = "AACG"
    a = revcomp_str(ov) + "CCAAG"  # head(A) = revcomp(ov)
    b = ov + "GGTCA"
    f = str(tmp_path / "g.gfa2")
    n = write_gfa2(f, [(0, a, 1.0), (1, b, 1.0)], k)
    assert n == 1
    ((s1, s2, b1, e1, b2, e2, aln),) = _edges(f)
    # either A- -> B+ or the mirror B- -> A+; both describe the same edge
    assert {s1, s2} in ({"Contig0-", "Contig1+"}, {"Contig1-", "Contig0+"})
    assert aln == "4M"


def test_tail_tail_orientation_edge(tmp_path):
    """A+ -> B- (tail-to-tail overlap)."""
    k = 5
    ov = "AACG"
    a = "CCAAG" + ov
    b = "GGTCA" + revcomp_str(ov)  # tail(B) = revcomp(ov) -> prefix(B-) = ov
    f = str(tmp_path / "g.gfa2")
    n = write_gfa2(f, [(0, a, 1.0), (1, b, 1.0)], k)
    assert n == 1
    ((s1, s2, b1, e1, b2, e2, aln),) = _edges(f)
    assert (s1, s2) == ("Contig0+", "Contig1-")
    assert (b1, e1) == ("5", "9$")
    assert (b2, e2) == ("5", "9$")


def test_no_spurious_edges(tmp_path):
    k = 5
    f = str(tmp_path / "g.gfa2")
    n = write_gfa2(f, [(0, "AAAACCCCC", 1.0), (1, "GGGGGTTTT", 1.0)], k)
    # AAAACCCCC tail CCCC vs GGGGGTTTT: prefix GGGG, revcomp(TTTT)=AAAA;
    # head AAAA -> revcomp = TTTT; no (k-1) matches besides... none
    assert n == 0
