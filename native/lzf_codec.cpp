// LZF codec for the feature-store writer (data/feature_store.py).
//
// The reference stores every feature map / mask chunk with HDF5's lzf
// filter (tfds_dense_descriptor.py:142-165).  h5py runs that filter
// inside the HDF5 pipeline under its global lock, single-threaded —
// measured ~90 MB/s on fp32 feature maps, which makes the deferred
// writer thread the steady-state co-bottleneck of the extraction sweep
// (docs/ROADMAP.md §3).  This kernel produces bit-compatible LZF
// streams *outside* the lock, batched over all of a patient's chunks
// with OpenMP; Python then writes the precompressed bytes with
// write_direct_chunk.  Format per the LZF stream spec (the same one
// h5py's bundled filter decodes):
//
//   ctrl < 0x20            : literal run of (ctrl + 1) bytes
//   ctrl >= 0x20           : back-reference; L = ctrl >> 5, extended by
//                            one length byte when L == 7; distance =
//                            ((ctrl & 0x1f) << 8 | low) + 1, max 8192;
//                            match length = L + 2, max 264
//
// Plain C ABI (pybind11 is not in this image); ctypes bindings in
// vit_deep_radiomics_tpu/utils/native.py.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t kHashBits = 16;
constexpr int64_t kHashSize = int64_t(1) << kHashBits;
constexpr int64_t kMaxOff = 8191;    // stored distance-1 fits 13 bits
constexpr int64_t kMaxMatch = 264;   // 2 + 7 + 255
constexpr int64_t kMaxLit = 32;

inline uint32_t hash3(const uint8_t* p) {
  uint32_t v = (uint32_t(p[0]) << 16) | (uint32_t(p[1]) << 8) | p[2];
  return ((v >> 12) ^ v * 2654435761u) >> (32 - kHashBits) & (kHashSize - 1);
}

// flush a pending literal run [lit, ip) in <=32-byte chunks
inline bool flush_literals(const uint8_t* lit, const uint8_t* ip,
                           uint8_t*& op, const uint8_t* oend) {
  while (lit < ip) {
    int64_t run = ip - lit;
    if (run > kMaxLit) run = kMaxLit;
    if (op + 1 + run > oend) return false;
    *op++ = uint8_t(run - 1);
    std::memcpy(op, lit, size_t(run));
    op += run;
    lit += run;
  }
  return true;
}

int64_t lzf_compress_one(const uint8_t* in, int64_t n, uint8_t* out,
                         int64_t cap, int64_t* tab) {
  if (n < 4 || cap <= 0) return 0;
  for (int64_t i = 0; i < kHashSize; ++i) tab[i] = -1;

  const uint8_t* ip = in;
  const uint8_t* iend = in + n;
  const uint8_t* ilimit = iend - 2;  // last position a 3-byte seq fits
  const uint8_t* lit = in;
  uint8_t* op = out;
  const uint8_t* oend = out + cap;

  while (ip < ilimit) {
    uint32_t h = hash3(ip);
    int64_t ref = tab[h];
    int64_t pos = ip - in;
    tab[h] = pos;
    int64_t off = pos - ref - 1;  // stored distance-1
    if (ref >= 0 && off <= kMaxOff && in[ref] == ip[0] &&
        in[ref + 1] == ip[1] && in[ref + 2] == ip[2]) {
      // extend the match (overlap with the current position is fine —
      // the decoder copies byte-by-byte)
      int64_t len = 3;
      int64_t maxlen = iend - ip;
      if (maxlen > kMaxMatch) maxlen = kMaxMatch;
      while (len < maxlen && in[ref + len] == ip[len]) ++len;

      if (!flush_literals(lit, ip, op, oend)) return 0;
      int64_t l = len - 2;
      if (l < 7) {
        if (op + 2 > oend) return 0;
        *op++ = uint8_t((off >> 8) | (l << 5));
      } else {
        if (op + 3 > oend) return 0;
        *op++ = uint8_t((off >> 8) | (7 << 5));
        *op++ = uint8_t(l - 7);
      }
      *op++ = uint8_t(off & 0xff);

      // index the skipped positions so later matches can find them
      const uint8_t* stop = ip + len;
      if (stop > ilimit) stop = ilimit;
      for (++ip; ip < stop; ++ip) tab[hash3(ip)] = ip - in;
      ip = in + pos + len;
      lit = ip;
    } else {
      ++ip;
    }
  }
  if (!flush_literals(lit, iend, op, oend)) return 0;
  return op - out;
}

int64_t lzf_decompress_one(const uint8_t* in, int64_t n, uint8_t* out,
                           int64_t cap) {
  const uint8_t* ip = in;
  const uint8_t* iend = in + n;
  uint8_t* op = out;
  const uint8_t* oend = out + cap;
  while (ip < iend) {
    int64_t ctrl = *ip++;
    if (ctrl < 0x20) {                       // literal run
      int64_t run = ctrl + 1;
      if (ip + run > iend || op + run > oend) return -1;
      std::memcpy(op, ip, size_t(run));
      ip += run;
      op += run;
    } else {                                 // back-reference
      int64_t len = ctrl >> 5;
      if (len == 7) {
        if (ip >= iend) return -1;
        len += *ip++;
      }
      len += 2;
      if (ip >= iend) return -1;
      int64_t dist = ((ctrl & 0x1f) << 8 | *ip++) + 1;
      const uint8_t* ref = op - dist;
      if (ref < out || op + len > oend) return -1;
      for (int64_t k = 0; k < len; ++k) op[k] = ref[k];  // may overlap
      op += len;
    }
  }
  return op - out;
}

}  // namespace

extern "C" {

// Compress one buffer. Returns the compressed size, or 0 when the
// result would not be smaller than `cap` (callers pass cap = n - 1 so
// only genuinely-compressible chunks are kept; incompressible chunks
// are written raw with the HDF5 filter masked out, exactly like the
// h5py lzf filter does).
int64_t vdr_lzf_compress(const uint8_t* in, int64_t n, uint8_t* out,
                         int64_t cap) {
  std::vector<int64_t> tab(kHashSize);
  return lzf_compress_one(in, n, out, cap, tab.data());
}

int64_t vdr_lzf_decompress(const uint8_t* in, int64_t n, uint8_t* out,
                           int64_t cap) {
  return lzf_decompress_one(in, n, out, cap);
}

// Batch compression over independent chunks, parallel with OpenMP.
// in_ptrs[i]/in_sizes[i] describe chunk i; out_ptrs[i] has capacity
// in_sizes[i] - 1 (only smaller-than-input results are kept).
// out_sizes[i] receives the compressed size or 0 (incompressible ->
// caller writes the raw chunk with the HDF5 filter masked out).
void vdr_lzf_compress_batch(const uint8_t* const* in_ptrs,
                            const int64_t* in_sizes,
                            uint8_t* const* out_ptrs, int64_t* out_sizes,
                            int64_t nbuf) {
#pragma omp parallel
  {
    // per-thread hash table (heap: 512 KB — too big for worker stacks),
    // reused across this thread's chunks
    std::vector<int64_t> tab(kHashSize);
#pragma omp for schedule(dynamic)
    for (int64_t i = 0; i < nbuf; ++i) {
      out_sizes[i] = lzf_compress_one(in_ptrs[i], in_sizes[i], out_ptrs[i],
                                      in_sizes[i] - 1, tab.data());
    }
  }
}

}  // extern "C"
