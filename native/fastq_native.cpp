// Native FASTQ parsing + base packing for mhm2_proxy_tpu.
//
// Plays the role of the reference's C++ FastqReader hot loops
// (/root/reference/src/fastq.cpp:124-238 record scanning, 504-540 record
// extraction) and PackedRead base packing (packed_reads.cpp:85-107): the
// Python layer hands a raw byte buffer and receives fixed-shape padded
// (reads x pad_len) code/qual blocks ready for jax.device_put, bypassing
// per-record Python string slicing.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

namespace {

// base code table: A/a=0 C/c=1 G/g=2 T/t=3, everything else (incl N) = 4
struct CodeTable {
  uint8_t t[256];
  CodeTable() {
    memset(t, 4, sizeof(t));
    t[(unsigned)'A'] = t[(unsigned)'a'] = 0;
    t[(unsigned)'C'] = t[(unsigned)'c'] = 1;
    t[(unsigned)'G'] = t[(unsigned)'g'] = 2;
    t[(unsigned)'T'] = t[(unsigned)'t'] = 3;
  }
};
const CodeTable CODE;

inline const char* find_nl(const char* p, const char* end) {
  const void* q = memchr(p, '\n', end - p);
  return q ? (const char*)q : end;
}

}  // namespace

extern "C" {

// Scan forward from `start` for the next record boundary: a line starting
// with '@' whose +2 line starts with '+' (fastq.cpp:124-238 semantics).
// Returns the boundary offset, or `n` if none found.
int64_t fastq_resync(const char* buf, int64_t n, int64_t start) {
  if (start <= 0) return 0;
  const char* end = buf + n;
  const char* p = find_nl(buf + start, end);
  if (p >= end) return n;
  ++p;
  for (int tries = 0; tries < 16 && p < end; ++tries) {
    if (*p == '@') {
      const char* l1 = find_nl(p, end);
      if (l1 >= end) return n;
      const char* l2 = find_nl(l1 + 1, end);
      if (l2 >= end) return n;
      if (l2 + 1 < end && l2[1] == '+') return p - buf;
    }
    p = find_nl(p, end);
    if (p >= end) return n;
    ++p;
  }
  return p - buf;
}

// Parse up to max_reads records from buf[offset..n) into padded blocks.
// codes: (max_reads * pad_len) prefilled by callee with 4; quals raw bytes
// prefilled with qual_pad. Reads longer than pad_len are truncated (callers
// size pad_len from a pre-scan). Returns the number of records parsed and
// sets *next_offset to the position after the last full record consumed.
int64_t fastq_parse_block(const char* buf, int64_t n, int64_t offset,
                          int64_t max_reads, int64_t pad_len, uint8_t qual_pad,
                          uint8_t* codes, uint8_t* quals, int32_t* lens,
                          int64_t* next_offset) {
  const char* end = buf + n;
  const char* p = buf + offset;
  int64_t nrec = 0;
  memset(codes, 4, max_reads * pad_len);
  memset(quals, qual_pad, max_reads * pad_len);
  memset(lens, 0, max_reads * sizeof(int32_t));
  while (nrec < max_reads && p < end) {
    const char* rec_start = p;
    // header line
    const char* h_end = find_nl(p, end);
    if (h_end >= end) break;
    // sequence line
    const char* s_beg = h_end + 1;
    const char* s_end = find_nl(s_beg, end);
    if (s_end >= end) break;
    // '+' line
    const char* plus = s_end + 1;
    const char* plus_end = find_nl(plus, end);
    if (plus_end >= end) break;
    // quality line (may be the last line without trailing newline)
    const char* q_beg = plus_end + 1;
    const char* q_end = find_nl(q_beg, end);
    if (q_beg > end) break;
    int64_t slen = s_end - s_beg;
    int64_t qlen = q_end - q_beg;
    int64_t L = slen < pad_len ? slen : pad_len;
    uint8_t* crow = codes + nrec * pad_len;
    uint8_t* qrow = quals + nrec * pad_len;
    for (int64_t i = 0; i < L; ++i) crow[i] = CODE.t[(uint8_t)s_beg[i]];
    int64_t QL = qlen < L ? qlen : L;
    memcpy(qrow, q_beg, QL);
    lens[nrec] = (int32_t)L;
    ++nrec;
    p = q_end < end ? q_end + 1 : end;
    (void)rec_start;
  }
  *next_offset = p - buf;
  return nrec;
}

// Max sequence-line length over the records in [offset, n) (for pad sizing),
// plus record count, in one pass. Returns count; *max_len set.
int64_t fastq_scan(const char* buf, int64_t n, int64_t offset, int64_t* max_len) {
  const char* end = buf + n;
  const char* p = buf + offset;
  int64_t cnt = 0, ml = 0;
  while (p < end) {
    const char* h_end = find_nl(p, end);
    if (h_end >= end) break;
    const char* s_beg = h_end + 1;
    const char* s_end = find_nl(s_beg, end);
    if (s_end >= end) break;
    const char* plus_end = find_nl(s_end + 1, end);
    if (plus_end >= end) break;
    const char* q_end = find_nl(plus_end + 1, end);
    int64_t slen = s_end - s_beg;
    if (slen > ml) ml = slen;
    ++cnt;
    p = q_end < end ? q_end + 1 : end;
  }
  *max_len = ml;
  return cnt;
}

// ASCII -> base codes for an arbitrary byte buffer (packed_reads analog).
void pack_bases(const char* seq, int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = CODE.t[(uint8_t)seq[i]];
}

}  // extern "C"
