"""Traversal vs the Python oracle: contig set equality."""

import numpy as np
import pytest

from mhm2_proxy_tpu.kcount import KmerCountStore
from mhm2_proxy_tpu.dbjg import traverse_debruijn_graph
from mhm2_proxy_tpu.oracle.pyref import count_kmers_oracle, traverse_oracle
from tests.test_count import reads_to_block


def contig_set(contigs):
    return sorted((seq, round(d, 9)) for seq, d in contigs)


def run_both(reads, k, ctgs=None):
    store = KmerCountStore(k)
    codes, qual_ok, lens = reads_to_block(reads)
    store.add_reads_block(codes, qual_ok, lens)
    table = store.finalize()
    got = traverse_debruijn_graph(table, k)
    exp = traverse_oracle(count_kmers_oracle(reads, k, ctgs=ctgs), k)
    return contig_set(got), contig_set(exp)


def coverage_reads(genome, k, rng, n=200, rl=None):
    rl = rl or (k + 30)
    reads = []
    G = len(genome)
    for _ in range(n):
        s = int(rng.integers(0, max(1, G - rl)))
        seq = genome[s : s + rl]
        reads.append((seq, chr(33 + 38) * len(seq)))
    return reads


@pytest.mark.parametrize("k", [21, 33])
def test_linear_genome(rng, k):
    genome = "".join(rng.choice(list("ACGT"), size=500))
    reads = coverage_reads(genome, k, rng)
    got, exp = run_both(reads, k)
    assert got == exp
    # with clean coverage the whole genome should assemble into few contigs
    assert len(exp) >= 1


def test_fork_genome(rng):
    """Two genomes sharing a region force forks that break contigs."""
    k = 21
    core = "".join(rng.choice(list("ACGT"), size=120))
    g1 = "".join(rng.choice(list("ACGT"), size=150)) + core + "".join(rng.choice(list("ACGT"), size=150))
    g2 = "".join(rng.choice(list("ACGT"), size=150)) + core + "".join(rng.choice(list("ACGT"), size=150))
    reads = coverage_reads(g1, k, rng, n=150) + coverage_reads(g2, k, rng, n=150)
    got, exp = run_both(reads, k)
    assert got == exp


def test_repeat_cycle(rng):
    """Circular genome -> cycle in the graph, broken deterministically."""
    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=200))
    circ = genome + genome[: k + 40]  # reads wrapping the origin
    reads = coverage_reads(circ, k, rng, n=200)
    got, exp = run_both(reads, k)
    assert got == exp


def test_with_errors(rng):
    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=400))
    reads = []
    for seq, q in coverage_reads(genome, k, rng, n=300):
        s = list(seq)
        if rng.random() < 0.3:
            p = int(rng.integers(0, len(s)))
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append(("".join(s), q))
    got, exp = run_both(reads, k)
    assert got == exp


def test_short_everything(rng):
    k = 21
    reads = [("ACGTACGTACGTACGTACGTACGTA", chr(71) * 25)] * 3
    got, exp = run_both(reads, k)
    assert got == exp


def test_stitch_doubling_equals_walker(rng):
    """Pointer-doubling stitcher == sequential walker on varied graphs."""
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.dbjg.traverse import build_edges, stitch_paths_walk
    from mhm2_proxy_tpu.dbjg.stitch import stitch_paths

    k = 21
    for kind in ("linear", "fork", "cycle"):
        if kind == "linear":
            genome = "".join(rng.choice(list("ACGT"), size=400))
        elif kind == "fork":
            core = "".join(rng.choice(list("ACGT"), size=80))
            genome = (
                "".join(rng.choice(list("ACGT"), size=120)) + core
                + "".join(rng.choice(list("ACGT"), size=120))
            )
        else:
            g = "".join(rng.choice(list("ACGT"), size=150))
            genome = g + g[: k + 30]
        reads = coverage_reads(genome, k, rng, n=150)
        store = KmerCountStore(k)
        codes, qual_ok, lens = reads_to_block(reads)
        store.add_reads_block(codes, qual_ok, lens)
        t = store.finalize()
        edges = build_edges(t.words, t.count, t.left, t.right, t.n, k)
        a = sorted((s, round(d, 9)) for s, d in stitch_paths(edges, t.words, t.count, k))
        b = sorted((s, round(d, 9)) for s, d in stitch_paths_walk(edges, t.words, t.count, k))
        assert a == b, kind


def test_stitch_native_equals_doubling(rng, monkeypatch):
    """Native sequential walker (native/stitch_native.cpp) == the numpy
    pointer-doubling stitcher, across paths, cycles, palindromic loops,
    and isolated nodes (same graph zoo as the walker test plus an
    inverted-repeat loop that traverses nodes in both orientations)."""
    from mhm2_proxy_tpu.io.native import get_stitch_walk
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.dbjg.traverse import build_edges
    from mhm2_proxy_tpu.dbjg import stitch as ST

    if get_stitch_walk() is None:
        import pytest

        pytest.skip("native stitcher unavailable")

    def revcomp(s):
        return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]

    k = 21
    cases = {}
    cases["linear"] = "".join(rng.choice(list("ACGT"), size=400))
    g = "".join(rng.choice(list("ACGT"), size=150))
    cases["cycle"] = g + g[: k + 30]
    h = "".join(rng.choice(list("ACGT"), size=120))
    # inverted-repeat (revcomp-palindromic) loop: h followed by its revcomp
    pal = h + revcomp(h)
    cases["palindrome"] = pal + pal[: k + 30]
    cases["isolated"] = (
        "".join(rng.choice(list("ACGT"), size=60))
        + "".join(rng.choice(list("ACGT"), size=400))
    )

    for kind, genome in cases.items():
        reads = coverage_reads(genome, k, rng, n=200)
        store = KmerCountStore(k)
        codes, qual_ok, lens = reads_to_block(reads)
        store.add_reads_block(codes, qual_ok, lens)
        t = store.finalize()
        edges = build_edges(t.words, t.count, t.left, t.right, t.n, k)
        a = sorted((s, round(d, 9))
                   for s, d in ST.stitch_paths(edges, t.words, t.count, k))
        monkeypatch.setattr(ST, "_stitch_native", lambda *args: None)
        b = sorted((s, round(d, 9))
                   for s, d in ST.stitch_paths(edges, t.words, t.count, k))
        monkeypatch.undo()
        assert a == b, kind


def test_nonreciprocal_edge_repair(rng):
    """A merge state (in-degree 2 — possible when edge reciprocity breaks)
    must be REPAIRED by dropping its in-edges (reference clean_frag_links
    drops non-reciprocal links, dbjg_traversal.cpp:392-430) instead of
    corrupting the walk: the native walker re-traverses shared tails and
    overflows; the doubling's path mapping turns ambiguous."""
    import numpy as np
    from mhm2_proxy_tpu.dbjg import stitch as ST
    from mhm2_proxy_tpu.ops import bitkmer as bk

    k = 5
    n = 4
    seqs = ["ACGTC", "GGATC", "TTACG", "CCCAG"]
    words = np.stack([np.asarray(bk.strings_to_words([s], k))[0] for s in seqs])
    count = np.full(n, 3, np.int32)
    uu = np.ones(n, bool)
    z = np.zeros(n, np.int64)
    edges = dict(
        uu=uu,
        r_idx=z.copy(), r_port=z.copy(), r_ok=np.zeros(n, bool),
        l_idx=z.copy(), l_port=z.copy(), l_ok=np.zeros(n, bool),
    )
    # nodes 0 and 1 both claim node 2 as right neighbor entering via L:
    # both target state 2*2+1 = 5 -> in-degree 2 (non-reciprocal)
    edges["r_ok"][[0, 1]] = True
    edges["r_idx"][[0, 1]] = 2
    edges["r_port"][[0, 1]] = 0
    timings = {}
    out = ST.stitch_paths(edges, words, count, k, timings=timings)
    assert timings.get("nonreciprocal_dropped", 0) >= 2
    # with the bogus edges dropped every node is isolated: 4 k-length contigs
    assert len(out) == n
    assert all(len(s) == k for s, _ in out)
