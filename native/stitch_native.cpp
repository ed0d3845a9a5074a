// Sequential path/cycle decomposition over the reciprocal-UU state graph
// (the de Bruijn stitch, reference dbjg_traversal.cpp:392-567 role).
//
// The graph is a disjoint union of simple paths and cycles over states
// s = 2*node + exit_port with a mirror symmetry s <-> s^1 reversing every
// chain (see mhm2_proxy_tpu/dbjg/stitch.py). The vectorized numpy pointer
// doubling is O(S log S) RANDOM gathers — ~26 rounds x 53M 8-byte gathers at
// arctic scale (27 Mbp), ~500 s of cache misses on the host. A sequential
// walk is O(S) total hops (~3S with the emit pass), one cache miss per hop:
// measured ~50x faster at the same scale. Semantics mirror stitch.py
// exactly:
//   - a path is walked from each no-predecessor state; emitted iff
//     start < (terminal ^ 1) — exactly one of the two directions;
//   - cycles are emitted from the leader state 2*min_node+1 iff that state
//     lies in the cycle's own direction (the mirror direction has no leader
//     state and is suppressed); revcomp-palindromic cycles are self-mirrored
//     and emit once with both orientations' states (matching numpy).
//
// succ encoding: >= 0 next state, -1 terminal, -2 invalid (non-UU node).
// Per-state base: the single base the state contributes when ENTERED
// (exit R -> last base of the node's kmer; exit L -> comp(first base)).
// Output layout: contig p owns out_buf[off_p, off_p + (k-1) + n_states_p);
// the walker fills positions >= k-1 (every state's base, the start's own at
// k-1); the caller writes the oriented head k-mer over [off_p, off_p+k).

#include <cstdint>
#include <vector>

extern "C" {

// returns the number of paths emitted, or -1 on buffer/paths overflow
int64_t stitch_walk(int64_t S, int32_t k, const int64_t *succ,
                    const uint8_t *base, const int32_t *counts,
                    uint8_t *out_buf, int64_t out_cap, int64_t *out_start,
                    int64_t *out_nstates, int64_t *out_depth,
                    int64_t max_paths) {
  std::vector<uint8_t> visited(S, 0);
  std::vector<uint8_t> has_pred(S, 0);
  for (int64_t s = 0; s < S; s++)
    if (succ[s] >= 0) has_pred[succ[s]] = 1;

  int64_t np = 0, off = 0;

  auto emit = [&](int64_t start, int64_t n) -> bool {
    if (np >= max_paths || off + (k - 1) + n > out_cap) return false;
    for (int64_t i = 0; i < k - 1; i++) out_buf[off + i] = 0;
    int64_t cur = start, depth = 0;
    for (int64_t i = 0; i < n; i++) {
      out_buf[off + (k - 1) + i] = base[cur];
      depth += counts[cur >> 1];
      cur = succ[cur];
    }
    out_start[np] = start;
    out_nstates[np] = n;
    out_depth[np] = depth;
    np++;
    off += (k - 1) + n;
    return true;
  };

  // paths: walk from every no-predecessor valid state (both directions of
  // each path are starts; the start < terminal^1 rule emits exactly one)
  for (int64_t s = 0; s < S; s++) {
    if (succ[s] == -2 || has_pred[s] || visited[s]) continue;
    int64_t t = s, n = 1;
    visited[s] = 1;
    while (succ[t] >= 0) {
      t = succ[t];
      visited[t] = 1;
      n++;
    }
    if (s < (t ^ 1))
      if (!emit(s, n)) return -1;
  }

  // cycles: everything valid and unvisited; stamp each cycle, emit from the
  // leader state 2*min_node+1 when it belongs to this direction
  std::vector<int64_t> stamp(S, -1);
  for (int64_t s = 0; s < S; s++) {
    if (succ[s] == -2 || visited[s]) continue;
    int64_t cur = s, minnode = s >> 1, len = 0;
    do {
      stamp[cur] = s;
      visited[cur] = 1;
      if ((cur >> 1) < minnode) minnode = cur >> 1;
      len++;
      cur = succ[cur];
    } while (cur != s);
    int64_t leader = 2 * minnode + 1;
    if (leader >= 0 && leader < S && stamp[leader] == s)
      if (!emit(leader, len)) return -1;
  }
  return np;
}

}  // extern "C"
