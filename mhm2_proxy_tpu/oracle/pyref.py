"""Slow, exact Python mirrors of the reference pipeline semantics.

Each function documents the reference behavior it mirrors with file:line
citations into /root/reference (the MHM2 contigging proxy). These exist purely
as test oracles; nothing here runs in the production path.
"""

from __future__ import annotations

M64 = (1 << 64) - 1

BASE_CODE = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 2}  # N packs as G (kmer.cpp:169 note)
COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N", "0": "0"}


def revcomp_str(s: str) -> str:
    """Reverse complement of an ACGTN string (utils.cpp:94-119)."""
    return "".join(COMP[c] for c in reversed(s))


def kmer_to_words(kmer: str, n_longs: int | None = None) -> list[int]:
    """Pack a k-mer into big-endian 2-bit uint64 words.

    Mirrors Kmer::set_kmer (kmer.cpp:298-320): base i goes to bits
    [62-2*(i%32), 64-2*(i%32)) of word i//32; trailing bits zero. N packs as G.
    """
    k = len(kmer)
    if n_longs is None:
        n_longs = (k + 31) // 32
    words = [0] * n_longs
    for i, c in enumerate(kmer.upper()):
        words[i // 32] |= BASE_CODE[c] << (2 * (31 - (i % 32)))
    return words


def words_to_kmer(words: list[int], k: int) -> str:
    """Inverse of kmer_to_words (kmer.cpp:565-575)."""
    out = []
    for i in range(k):
        code = (words[i // 32] >> (2 * (31 - (i % 32)))) & 3
        out.append("ACGT"[code])
    return "".join(out)


def canonical(kmer: str) -> tuple[str, bool]:
    """Return (least of kmer/revcomp by packed-word compare, was_rc).

    The reference compares packed uint64 arrays lexicographically
    (kmer.cpp:266-272); for ACGT strings this equals string comparison since
    base codes are in alphabetical order. N packs as G, so compare via codes.
    """
    rc = revcomp_str(kmer)
    a = kmer_to_words(kmer)
    b = kmer_to_words(rc)
    if b < a:
        return rc, True
    return kmer, False


def _revcomp_mmer(v: int, m: int) -> int:
    """revcomp of a top-aligned packed m-mer (kmer.cpp:426-433).

    Equivalent to: complement all 64 bits, reverse the 32 2-bit fields, then
    shift left by 2*(32-m).
    """
    x = (~v) & M64
    # reverse 2-bit fields of a 64-bit value
    x = ((x & 0x3333333333333333) << 2) | ((x >> 2) & 0x3333333333333333)
    x = ((x & 0x0F0F0F0F0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F0F0F0F0F)
    x = ((x & 0x00FF00FF00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF00FF00FF)
    x = ((x & 0x0000FFFF0000FFFF) << 16) | ((x >> 16) & 0x0000FFFF0000FFFF)
    x = ((x & 0x00000000FFFFFFFF) << 32) | ((x >> 32) & 0x00000000FFFFFFFF)
    return (x << (2 * (32 - m))) & M64


def _pack_mmer(s: str) -> int:
    """Pack an m-mer into the top 2m bits of a uint64."""
    v = 0
    for i, c in enumerate(s):
        v |= BASE_CODE[c.upper()] << (2 * (31 - i))
    return v


def minimizer_of(kmer: str, m: int) -> int:
    """Greatest least-complement m-mer of the k-mer.

    Mirrors Kmer::get_minimizer_fast with least_complement=true
    (kmer.cpp:344-403): for each position i in [0, k-m], candidate =
    min(packed fwd m-mer, its revcomp); minimizer = max over candidates.
    Strand symmetric: minimizer(kmer) == minimizer(revcomp(kmer)).
    """
    k = len(kmer)
    best = 0
    for i in range(k - m + 1):
        cand = _pack_mmer(kmer[i : i + m])
        rc = _revcomp_mmer(cand, m)
        least = min(cand, rc)
        if least > best:
            best = least
    return best


def quick_hash(v: int) -> int:
    """64-bit mix hash (hash_funcs.c:332-342)."""
    v = (v * 3935559000370003845 + 2691343689449507681) & M64
    v ^= v >> 21
    v ^= (v << 37) & M64
    v ^= v >> 4
    v = (v * 4768777513237032717) & M64
    v ^= (v << 20) & M64
    v ^= v >> 41
    v ^= (v << 5) & M64
    return v


def target_shard(kmer: str, m: int, n_shards: int) -> int:
    """Owner shard of a (canonical) k-mer (kmer_dht.cpp:193-196)."""
    return quick_hash(minimizer_of(kmer, m)) % n_shards


def minimizer_len_for_k(k: int) -> int:
    """clamp(2k/3+1, 15, 27) (kmer_dht.cpp:114-116)."""
    return max(15, min(27, k * 2 // 3 + 1))


def ext_call(counts4: list[int], count: int, dmin_thres: int = 2) -> str:
    """Extension call from per-base ext counts (kcount_cpu.cpp:173-182).

    Sort desc by (count, base char desc); dmin_dyn = max(int((1.0-0.9)*count),
    dmin_thres) computed in double precision with C truncation; 'X' if top <
    dmin_dyn, 'F' if runner-up >= dmin_dyn, else top base.
    """
    order = sorted(zip("ACGT", counts4), key=lambda e: (e[1], e[0]), reverse=True)
    top_c, runner_c = order[0][1], order[1][1]
    dmin_dyn = max(int((1.0 - 0.9) * count), dmin_thres)
    if top_c < dmin_dyn:
        return "X"
    if runner_c >= dmin_dyn:
        return "F"
    return order[0][0]


def _sat_add(a: int, b: int) -> int:
    return min(a + b, 0xFFFF)


def count_kmers_oracle(
    reads: list[tuple[str, str]],
    k: int,
    qual_offset: int = 33,
    dmin_thres: int = 2,
    ctgs: list[tuple[str, int]] | None = None,
):
    """Dict-based k-mer counting with extension tracking.

    Mirrors the full read pass (kcount.cpp:54-98 + kcount_cpu.cpp): bases with
    phred < 20 only contribute k-mer presence, not extensions (their ext char
    becomes '0', kcount_cpu.cpp:321-324); only k-mers at positions
    [1, len-k-1] of each read are counted (process_seq, kcount_cpu.cpp:84-101);
    k-mers and ext counts accumulate with uint16 saturation; canonical k-mer
    orientation swaps and complements the extensions (kcount_cpu.cpp:326-332).

    If ctgs is given, applies the contig-kmer second pass with the conflict
    rules of insert_supermer_from_ctg (kcount_cpu.cpp:357-406) in a
    deterministic formulation (see kcount/ docs for the equivalence argument).

    Returns {canonical_kmer_str: (count, left_char, right_char)} after the
    purge rules of insert_into_local_hashtable (kcount_cpu.cpp:491-528):
    drop count < 2 and drop left=='X' and right=='X'.
    """
    table: dict[str, list] = {}  # kmer -> [count, [4 left], [4 right]]

    def accumulate(kmer: str, left: str, right: str, cnt: int):
        kmer = kmer.upper().replace("N", "G")
        kc, was_rc = canonical(kmer)
        if was_rc:
            left, right = COMP[right], COMP[left]
        e = table.setdefault(kc, [0, [0, 0, 0, 0], [0, 0, 0, 0]])
        e[0] = _sat_add(e[0], cnt)
        if left in "ACGT":
            i = "ACGT".index(left)
            e[1][i] = _sat_add(e[1][i], cnt)
        if right in "ACGT":
            i = "ACGT".index(right)
            e[2][i] = _sat_add(e[2][i], cnt)

    for seq, quals in reads:
        if len(seq) < k:
            continue
        good = [ord(q) - qual_offset >= 20 for q in quals]
        for i in range(1, len(seq) - k):
            kmer = seq[i : i + k]
            left = seq[i - 1].upper() if good[i - 1] else "0"
            right = seq[i + k].upper() if good[i + k] else "0"
            if left == "N":
                left = "0"
            if right == "N":
                right = "0"
            accumulate(kmer, left, right, 1)

    if ctgs:
        # deterministic ctg-kmer merge; see kcount_cpu.cpp:357-406
        ctg_occ: dict[str, list] = {}  # kmer -> [set((l,r)), min_depth]
        for seq, depth in ctgs:
            if len(seq) < k + 2:
                continue
            depth = min(max(int(depth), 0), 0xFFFF)
            for i in range(1, len(seq) - k):
                kmer = seq[i : i + k]
                left, right = seq[i - 1], seq[i + k]
                kc, was_rc = canonical(kmer)
                if was_rc:
                    left, right = COMP[right], COMP[left]
                e = ctg_occ.setdefault(kc, [set(), 0xFFFF])
                e[0].add((left, right))
                e[1] = min(e[1], depth)
        for kc, (pairs, min_depth) in ctg_occ.items():
            cnt = 0 if len(pairs) > 1 else min_depth
            left, right = next(iter(pairs)) if len(pairs) == 1 else ("X", "X")
            re = table.get(kc)
            if re is not None:
                # keep the read entry only if it is a UU kmer with count >= 2
                l_call = ext_call(re[1], re[0], dmin_thres)
                r_call = ext_call(re[2], re[0], dmin_thres)
                if re[0] >= 2 and l_call in "ACGT" and r_call in "ACGT":
                    continue
            ent = [cnt, [0, 0, 0, 0], [0, 0, 0, 0]]
            if left in "ACGT":
                ent[1]["ACGT".index(left)] = cnt
            if right in "ACGT":
                ent[2]["ACGT".index(right)] = cnt
            table[kc] = ent

    out = {}
    for kmer, (count, lext, rext) in table.items():
        if count < 2:
            continue
        left = ext_call(lext, count, dmin_thres)
        right = ext_call(rext, count, dmin_thres)
        if left == "X" and right == "X":
            continue
        out[kmer] = (count, left, right)
    return out


def traverse_oracle(table: dict[str, tuple[int, str, str]], k: int):
    """Reference-equivalent de Bruijn path decomposition.

    The reference's claim-based parallel walk (dbjg_traversal.cpp:165-335 plus
    the clean/connect phases at 392-567) is equivalent to decomposing the
    graph of *reciprocal* UU edges into simple paths and cycles:

    - only UU k-mers (left and right calls in ACGT) participate in walks
      (walks terminate with DEADEND/FORK at any non-UU neighbor *without*
      consuming it, dbjg_traversal.cpp:173-185);
    - an edge A->B (walking right from oriented A with ext e) is valid iff
      B = A[1:]+e exists (canonically), B is UU, and B's oriented left ext
      equals A[0] (otherwise CONFLICT, dbjg_traversal.cpp:192-197) — a
      condition symmetric in A and B;
    - self-loops terminate as REPEAT (dbjg_traversal.cpp:204-207);
    - cycles are emitted broken at a single point (the reference breaks at the
      nondeterministic walk start; we break at the minimum canonical k-mer).

    Returns a list of (seq, depth) with seq in canonical orientation
    (min(seq, revcomp(seq))) and depth = sum of k-mer counts / (len - k + 2)
    (contigging depth formula, dbjg_traversal.cpp:542).
    """
    uu = {km: v for km, v in table.items() if v[1] in "ACGT" and v[2] in "ACGT"}

    def step_right(oriented: str) -> tuple[str, bool] | None:
        """From an oriented UU kmer, step right; return (next_oriented, ok)."""
        kc, was_rc = canonical(oriented)
        cnt, left, right = uu[kc]
        if was_rc:
            left, right = COMP[right], COMP[left]
        nxt = oriented[1:] + right
        nc, n_rc = canonical(nxt)
        if nc not in uu:
            return None
        ncnt, nleft, nright = uu[nc]
        if n_rc:
            nleft, nright = COMP[nright], COMP[nleft]
        if nleft != oriented[0]:
            return None  # CONFLICT: non-reciprocal
        if nxt == oriented:
            return None  # self-loop REPEAT
        return nxt

    visited = set()
    contigs = []
    # deterministic order
    for start in sorted(uu):
        if start in visited:
            continue
        # walk left as far as possible (i.e. walk right from the revcomp)
        cur = start
        seen = {start}
        is_cycle = False
        while True:
            prev = step_right(revcomp_str(cur))
            if prev is None:
                break
            prev = revcomp_str(prev)
            pc, _ = canonical(prev)
            if pc in seen:
                is_cycle = True
                break
            seen.add(pc)
            cur = prev
        if is_cycle:
            # break cycles at the minimum canonical k-mer, walking right
            # (deterministic replacement for the reference's nondeterministic
            # walk-start break point)
            cur = start
        # now walk right from cur collecting the path
        path = [cur]
        seen2 = {canonical(cur)[0]}
        while True:
            nxt = step_right(path[-1])
            if nxt is None:
                break
            nc, _ = canonical(nxt)
            if nc in seen2:
                break  # closed the cycle
            seen2.add(nc)
            path.append(nxt)
        for km in path:
            visited.add(canonical(km)[0])
        seq = path[0] + "".join(p[-1] for p in path[1:])
        depth_sum = sum(uu[canonical(p)[0]][0] for p in path)
        rc = revcomp_str(seq)
        if rc < seq:
            seq = rc
        contigs.append((seq, depth_sum / (len(seq) - k + 2)))
    return contigs
