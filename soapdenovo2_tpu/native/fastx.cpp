// Native read decoder: FASTQ/FASTA text -> 2-bit base codes.
//
// The host-side counterpart of the reference's C read ingestion
// (standardPregraph/readseq1by1.c + the AIO double-buffering of
// prlHashReads.c:762): parsing and 2-bit packing must keep up with the
// device consuming ~50M k-mers/s, which pure-Python per-read decoding
// cannot.  Exposed via ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC fastx.cpp -o libfastx.so -lz

#include <cstdint>
#include <cstring>
#include <zlib.h>

namespace {

constexpr uint8_t BASE_N = 4;

struct Lut {
  uint8_t v[256];
  Lut() {
    std::memset(v, BASE_N, sizeof(v));
    v['A'] = v['a'] = 0;
    v['C'] = v['c'] = 1;
    v['G'] = v['g'] = 2;
    v['T'] = v['t'] = 3;
  }
};
const Lut kLut;

// complement of a code (3 - c) for codes < 4, N stays N
inline uint8_t comp(uint8_t c) { return c < 4 ? (uint8_t)(3 - c) : BASE_N; }

}  // namespace

extern "C" {

// Parse FASTQ ('@') or FASTA ('>') text records from buf[*pos..n).
//
// Writes up to max_reads decoded reads into `codes` using `row_stride`
// rows of `max_len` bytes (rows beyond the read length are padded with
// BASE_N), and the read lengths into `lengths` (stride `len_stride`).
// clip > 0 truncates reads to `clip` bases (rd_len_cutoff semantics);
// rc != 0 reverse-complements each read (reverse_seq=1 libraries).
//
// Returns the number of reads decoded; *pos advances to the first byte
// of the next unconsumed record (so callers can refill the buffer and
// continue — record-boundary repair like initAIO/AIORead).
int64_t fastx_decode(const uint8_t* buf, int64_t n, int64_t* pos,
                     uint8_t* codes, int64_t codes_row0, int64_t row_stride,
                     int32_t* lengths, int64_t len_stride,
                     int64_t max_reads, int64_t max_len,
                     int32_t rc, int32_t clip) {
  int64_t p = *pos;
  int64_t out = 0;
  while (out < max_reads && p < n) {
    // skip blank lines
    while (p < n && (buf[p] == '\n' || buf[p] == '\r')) p++;
    if (p >= n) break;
    const uint8_t tag = buf[p];
    if (tag != '@' && tag != '>') {  // garbage: resync to next line
      while (p < n && buf[p] != '\n') p++;
      continue;
    }
    const int64_t rec_start = p;
    // header line
    while (p < n && buf[p] != '\n') p++;
    if (p >= n) { p = rec_start; break; }
    p++;  // past newline
    // sequence: FASTA allows multi-line (until '>' or EOF); FASTQ is one
    // line followed by '+' and quality
    uint8_t* row = codes + codes_row0 + (out * row_stride) * max_len;
    int64_t len = 0;
    if (tag == '>') {
      while (p < n && buf[p] != '>') {
        const uint8_t c = buf[p++];
        if (c == '\n' || c == '\r') continue;
        if (len < max_len) row[len++] = kLut.v[c];
      }
      if (p >= n && n > 0 && buf[n - 1] != '\n') {
        // potentially truncated record at buffer end; only commit if the
        // caller signals EOF by passing pos == n afterwards -- here we
        // commit (FASTA tail) since refilling callers slice at rec_start
      }
    } else {
      const int64_t seq_start = p;
      while (p < n && buf[p] != '\n') {
        const uint8_t c = buf[p++];
        if (len < max_len) row[len++] = kLut.v[c];
      }
      if (p >= n) { p = rec_start; break; }
      p++;
      // '+' line
      if (p >= n || buf[p] != '+') { p = rec_start; break; }
      while (p < n && buf[p] != '\n') p++;
      if (p >= n) { p = rec_start; break; }
      p++;
      // quality line: same byte count as sequence
      int64_t q = 0, qlen = p == 0 ? 0 : (int64_t)(p - seq_start);
      (void)qlen;
      int64_t seq_bytes = 0;
      // recount raw sequence bytes (without newline)
      for (int64_t s = seq_start; s < n && buf[s] != '\n'; s++) seq_bytes++;
      while (p < n && q < seq_bytes && buf[p] != '\n') { p++; q++; }
      if (q < seq_bytes && p >= n) { p = rec_start; break; }
      while (p < n && buf[p] != '\n') p++;
      if (p < n) p++;
    }
    if (clip > 0 && len > clip) len = clip;
    if (rc) {
      for (int64_t i = 0, j = len - 1; i < j; i++, j--) {
        const uint8_t t = comp(row[i]);
        row[i] = comp(row[j]);
        row[j] = t;
      }
      if (len & 1) row[len / 2] = comp(row[len / 2]);
    }
    for (int64_t i = len; i < max_len; i++) row[i] = BASE_N;
    lengths[out * len_stride] = (int32_t)len;
    out++;
  }
  *pos = p;
  return out;
}

// Streaming gzip inflate helper so .gz FASTQ decodes natively too.
// Returns bytes written to out (may be < out_cap at stream end);
// *state_inout carries a z_stream pointer across calls (0 to init).
int64_t gz_inflate(void** state_inout, const uint8_t* in, int64_t in_n,
                   int64_t* in_consumed, uint8_t* out, int64_t out_cap) {
  z_stream* zs = (z_stream*)(*state_inout);
  if (!zs) {
    zs = new z_stream();
    std::memset(zs, 0, sizeof(*zs));
    if (inflateInit2(zs, 15 + 32) != Z_OK) {  // zlib or gzip auto
      delete zs;
      return -1;
    }
    *state_inout = zs;
  }
  zs->next_in = const_cast<uint8_t*>(in);
  zs->avail_in = (uInt)in_n;
  zs->next_out = out;
  zs->avail_out = (uInt)out_cap;
  int ret = inflate(zs, Z_NO_FLUSH);
  if (ret != Z_OK && ret != Z_STREAM_END && ret != Z_BUF_ERROR) return -2;
  *in_consumed = in_n - zs->avail_in;
  int64_t produced = out_cap - zs->avail_out;
  if (ret == Z_STREAM_END) {
    // concatenated gzip members (bgzf etc.): reset for the next member
    inflateReset2(zs, 15 + 32);
  }
  return produced;
}

void gz_free(void* state) {
  z_stream* zs = (z_stream*)state;
  if (zs) {
    inflateEnd(zs);
    delete zs;
  }
}

}  // extern "C"
