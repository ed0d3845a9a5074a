// Native paired-read merge for mhm2_proxy_tpu.
//
// Plays the role of the reference's C++/SSE merge loop
// (/root/reference/src/merge_reads.cpp:237-495): per pair, a sequential
// sliding-window overlap scan with a byte-mismatch prefilter, the
// quality-differential error model, and the best/found/ambiguous/abort
// state machine. Bit-compatible with the vectorized JAX formulation in
// mhm2_proxy_tpu/io/merge.py (which remains the device/test path): same
// constants, same Q2Perror table, same N-handling (pre-zeroed N quals),
// same processed-prefix gating, perror accumulated in double and compared
// in float like oracle/merge_ref.py.
//
// Merging is ingest-side (host-resident inputs and outputs), so the host
// must do this work; the block-vectorized JAX-on-CPU formulation costs
// ~300 us/pair on this box where this scalar scan with early exits costs
// ~3 us. Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int MIN_OVERLAP = 12;
constexpr int EXTRA_TEST_OVERLAP = 2;
constexpr int MAX_MISMATCHES = 3;
constexpr int EXTRA_MM_PER_1000 = 150;
constexpr float MAX_PERROR = 0.025f;

// Q2Perror[q] = 10^(-q/10) (merge_reads.cpp:73-81); must match
// io/merge.py::_Q2PERROR exactly.
const double Q2P[80] = {
    1.0, 0.7943, 0.6309, 0.5012, 0.3981, 0.3162, 0.2512, 0.1995, 0.1585, 0.1259,
    0.1, 0.07943, 0.06310, 0.05012, 0.03981, 0.03162, 0.02512, 0.01995, 0.01585, 0.01259,
    0.01, 0.007943, 0.006310, 0.005012, 0.003981, 0.003162, 0.002512, 0.001995, 0.001585, 0.001259,
    0.001, 0.0007943, 0.0006310, 0.0005012, 0.0003981, 0.0003162, 0.0002512, 0.0001995, 0.0001585, 0.0001259,
    0.0001, 7.943e-05, 6.310e-05, 5.012e-05, 3.981e-05, 3.162e-05, 2.512e-05, 1.995e-05, 1.585e-05, 1.259e-05,
    1e-05, 7.943e-06, 6.310e-06, 5.012e-06, 3.981e-06, 3.162e-06, 2.512e-06, 1.995e-06, 1.585e-06, 1.259e-06,
    1e-06, 7.943e-07, 6.310e-07, 5.012e-07, 3.981e-07, 3.1622e-07, 2.512e-07, 1.995e-07, 1.585e-07, 1.259e-07,
    1e-07, 7.943e-08, 6.310e-08, 5.012e-08, 3.981e-08, 3.1622e-08, 2.512e-08, 1.995e-08, 1.585e-08, 1.259e-08};

struct ShiftEval {
  bool good, weak, abort_here;
};

// Detailed scoring at one shift (merge_reads.cpp:346-443; mirrors
// merge.py::_eval_shift including the processed-prefix gating).
inline ShiftEval eval_shift(const uint8_t* a, const int* q1, const uint8_t* rc2,
                            const int* q2, int overlap) {
  ShiftEval r{false, false, false};
  const int this_max = MAX_MISMATCHES + (EXTRA_MM_PER_1000 * overlap) / 1000;
  const int error_max = (this_max * 4) / 3 + 1;

  int byte_mm = 0;
  for (int j = 0; j < overlap; j++) byte_mm += (a[j] != rc2[j]);
  if (byte_mm > error_max) return r;  // prefilter (SSE popcnt analog)

  int cum_mm = 0, cum_match_n = 0, cum_mm_n = 0, matches = 0, mm_total = 0;
  bool complete = true, abort_here = false;
  double perror = 0.0;
  for (int j = 0; j < overlap; j++) {
    const bool proc = (j == 0) || (cum_mm <= error_max);
    if (!proc) complete = false;
    const bool is_mm = a[j] != rc2[j];
    const bool has_n = (a[j] == 4) || (rc2[j] == 4);
    const int det = is_mm ? (1 + (has_n ? 1 : 0)) : 0;
    const bool match_n = (a[j] == 4) && (rc2[j] == 4);
    cum_mm += det;
    cum_match_n += match_n ? 1 : 0;
    cum_mm_n += (is_mm && has_n) ? 1 : 0;
    const int ncount = 2 * cum_match_n + cum_mm_n;
    if (proc && (((cum_match_n >= 2) && match_n) || ncount > 3)) abort_here = true;
    matches += (a[j] == rc2[j]);
    mm_total += det;
    if (is_mm) {
      const int qq1 = a[j] == 4 ? 0 : (q1[j] < 0 ? 0 : (q1[j] > 79 ? 79 : q1[j]));
      const int qq2 = rc2[j] == 4 ? 0 : (q2[j] < 0 ? 0 : (q2[j] > 79 ? 79 : q2[j]));
      int diffq = qq1 - qq2;
      if (diffq < 0) diffq = -diffq;
      double pe = diffq <= 2 ? 0.5 : Q2P[diffq];
      if (a[j] == 4) pe += Q2P[qq2];
      else if (rc2[j] == 4) pe += Q2P[qq1];
      perror += pe;
    }
  }
  if (abort_here) {
    r.abort_here = true;
    return r;
  }
  if (!complete) return r;
  const float pe_ratio = (float)perror / (float)(overlap > 0 ? overlap : 1);
  const int match_thres = overlap - this_max > MIN_OVERLAP ? overlap - this_max : MIN_OVERLAP;
  if (matches >= match_thres && mm_total <= this_max && pe_ratio <= MAX_PERROR) {
    r.good = true;
  } else if (mm_total <= error_max && pe_ratio <= MAX_PERROR * 4.0f / 3.0f) {
    r.weak = true;
  }
  return r;
}

void merge_range(int64_t b0, int64_t b1, const uint8_t* codes1,
                 const uint8_t* quals1, const int32_t* len1,
                 const uint8_t* codes2, const uint8_t* quals2,
                 const int32_t* len2, int64_t L, int32_t qoff,
                 uint8_t* merged, uint8_t* m_codes, uint8_t* m_quals,
                 int32_t* m_len, int32_t* overlap_out, uint8_t* q1z_out,
                 uint8_t* q2z_out, int64_t* n_ambig) {
  std::vector<uint8_t> rc2(L);
  std::vector<int> rq2(L), q1w(L);
  int64_t ambig = 0;
  for (int64_t b = b0; b < b1; b++) {
    const uint8_t* c1 = codes1 + b * L;
    const uint8_t* c2 = codes2 + b * L;
    const uint8_t* q1 = quals1 + b * L;
    const uint8_t* q2 = quals2 + b * L;
    const int l1 = len1[b], l2 = len2[b];
    uint8_t* q1z = q1z_out + b * L;
    uint8_t* q2z = q2z_out + b * L;
    for (int64_t j = 0; j < L; j++) {
      q1z[j] = c1[j] == 4 ? (uint8_t)qoff : q1[j];
      q2z[j] = c2[j] == 4 ? (uint8_t)qoff : q2[j];
    }
    uint8_t* mc = m_codes + b * 2 * L;
    uint8_t* mq = m_quals + b * 2 * L;
    memset(mc, 4, 2 * L);
    memset(mq, (uint8_t)qoff, 2 * L);
    merged[b] = 0;
    m_len[b] = 0;
    overlap_out[b] = 0;
    if (l1 <= 0 || l2 <= 0) continue;

    for (int j = 0; j < l2; j++) {
      const uint8_t c = c2[l2 - 1 - j];
      rc2[j] = c < 4 ? (uint8_t)(3 - c) : c;
      rq2[j] = (int)q2z[l2 - 1 - j] - qoff;
    }
    const int ov_len = l1 < l2 ? l1 : l2;
    const int start_i = l1 - ov_len;
    const int n_i = ov_len - MIN_OVERLAP + EXTRA_TEST_OVERLAP;

    int best = -1, found = -1, n_amb = 0;
    bool aborted = false;
    for (int i = 0; i < n_i; i++) {
      const int overlap = ov_len - i;
      const uint8_t* a = c1 + start_i + i;
      for (int j = 0; j < overlap; j++) q1w[j] = (int)q1z[start_i + i + j] - qoff;
      ShiftEval e = eval_shift(a, q1w.data(), rc2.data(), rq2.data(), overlap);
      const bool fresh = best < 0 && found < 0;
      const bool good_ambig = e.good && !fresh;
      const bool weak_ambig = e.weak && best >= 0;
      if (e.good && fresh) best = i;
      if (good_ambig || weak_ambig) best = -1;
      if (e.weak) found = i;
      if (e.abort_here) aborted = true;
      if (e.abort_here || good_ambig || weak_ambig) {
        n_amb++;
        break;  // done
      }
    }
    ambig += n_amb;
    if (best < 0 || aborted) continue;

    const int bi = best;
    const int overlap = ov_len - bi;
    const int cut = start_i + bi;
    const int mlen = l1 + l2 - overlap;
    merged[b] = 1;
    m_len[b] = mlen;
    overlap_out[b] = overlap;
    for (int t = 0; t < cut; t++) {
      mc[t] = c1[t];
      mq[t] = q1z[t];
    }
    for (int j = 0; j < l2; j++) {
      const int t = cut + j;
      uint8_t base;
      int q;
      if (j < overlap) {
        const uint8_t av = c1[cut + j];
        const int q1v = (int)q1z[cut + j] - qoff;
        const int q2v = rq2[j];
        if (av == rc2[j]) {
          base = rc2[j];
          q = q1v + q2v;
          if (q > 41) q = 41;
        } else {
          base = q1v < q2v ? rc2[j] : av;
          q = q1v - q2v;
          if (q < 0) q = -q;
          if (q < 2) q = 2;
        }
      } else {
        base = rc2[j];
        q = rq2[j];
      }
      if (q < 0) q = 0;
      if (q > 255 - qoff) q = 255 - qoff;
      mc[t] = base;
      mq[t] = (uint8_t)(q + qoff);
    }
  }
  *n_ambig = ambig;
}

}  // namespace

extern "C" {

// Merge B read pairs. codes/quals are (B, L) row-major uint8 (codes 0-3,
// 4=N; quals raw phred+offset). Outputs: merged (B,) 0/1; m_codes/m_quals
// (B, 2L) with rows filled to m_len and 4/qoff elsewhere; m_len, overlap
// (B,) int32; q1z/q2z (B, L) N-zeroed quals; returns total ambiguous count.
int64_t mhm2_merge_pairs(const uint8_t* codes1, const uint8_t* quals1,
                         const int32_t* len1, const uint8_t* codes2,
                         const uint8_t* quals2, const int32_t* len2,
                         int64_t B, int64_t L, int32_t qual_offset,
                         int32_t n_threads, uint8_t* merged,
                         uint8_t* m_codes, uint8_t* m_quals, int32_t* m_len,
                         int32_t* overlap_out, uint8_t* q1z, uint8_t* q2z) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > B) n_threads = B > 0 ? (int32_t)B : 1;
  std::vector<std::thread> threads;
  std::vector<int64_t> ambig(n_threads, 0);
  const int64_t per = (B + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    const int64_t b0 = t * per;
    const int64_t b1 = (t + 1) * per < B ? (t + 1) * per : B;
    if (b0 >= b1) break;
    threads.emplace_back(merge_range, b0, b1, codes1, quals1, len1, codes2,
                         quals2, len2, L, qual_offset, merged, m_codes,
                         m_quals, m_len, overlap_out, q1z, q2z, &ambig[t]);
  }
  for (auto& th : threads) th.join();
  int64_t total = 0;
  for (auto a : ambig) total += a;
  return total;
}

}  // extern "C"
