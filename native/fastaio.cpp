// fastaio: native host-side sequence pipeline for galah_tpu.
//
// Replaces the roles the reference delegates to needletail (FASTA/gzip
// parsing, reference: src/genome_stats.rs:17, src/skani.rs:87) and the
// hashing front half of finch/skani: canonical k-mer extraction,
// splitmix64 FracMinHash sketching (fragment + genome level) and
// MurmurHash3_x64_128 bottom-k Mash sketching — feeding numpy arrays
// through a ctypes interface (no pybind11 in this environment).
//
// gzip-transparent via zlib's gzopen (which reads plain files too).
//
// Build: make -C native   (produces libfastaio.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

#include <dlfcn.h>
#include <sys/stat.h>

// libdeflate (2-3x faster whole-buffer gunzip) resolved at RUNTIME via
// dlopen so the shared library keeps zero hard dependencies beyond
// zlib — hosts without libdeflate silently keep the zlib streaming
// path instead of losing the whole native extension to a missing DSO.
namespace gzfast {
typedef void* (*alloc_fn)();
typedef void (*free_fn)(void*);
// enum libdeflate_result: 0 SUCCESS, 1 BAD_DATA, 2 SHORT_OUTPUT,
// 3 INSUFFICIENT_SPACE (stable ABI, /usr/include/libdeflate.h).
typedef int (*dec_fn)(void*, const void*, size_t, void*, size_t, size_t*,
                      size_t*);
constexpr int SUCCESS = 0, INSUFFICIENT_SPACE = 3;
struct Api {
  alloc_fn alloc = nullptr;
  free_fn free_d = nullptr;
  dec_fn decompress = nullptr;
  bool ok = false;
};
inline const Api& api() {
  static const Api a = [] {
    Api r;
    void* h = dlopen("libdeflate.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!h) h = dlopen("libdeflate.so", RTLD_NOW | RTLD_LOCAL);
    if (!h) return r;
    r.alloc = (alloc_fn)dlsym(h, "libdeflate_alloc_decompressor");
    r.free_d = (free_fn)dlsym(h, "libdeflate_free_decompressor");
    r.decompress = (dec_fn)dlsym(h, "libdeflate_gzip_decompress_ex");
    r.ok = r.alloc && r.free_d && r.decompress;
    return r;
  }();
  return a;
}
}  // namespace gzfast

namespace {

// ----------------------------------------------------------------------
// Base encoding
// ----------------------------------------------------------------------

constexpr uint8_t INVALID = 255;

struct CodeLut {
  uint8_t lut[256];
  CodeLut() {
    std::memset(lut, INVALID, sizeof(lut));
    lut[(int)'A'] = 0; lut[(int)'a'] = 0;
    lut[(int)'C'] = 1; lut[(int)'c'] = 1;
    lut[(int)'G'] = 2; lut[(int)'g'] = 2;
    lut[(int)'T'] = 3; lut[(int)'t'] = 3;
  }
};
const CodeLut kCode;

// ----------------------------------------------------------------------
// splitmix64 finalizer (parity with galah_tpu.sketch.fracminhash.mix64)
// ----------------------------------------------------------------------

inline uint64_t mix64(uint64_t x) {
  x ^= x >> 30;
  x *= 0xBF58476D1CE4E5B9ULL;
  x ^= x >> 27;
  x *= 0x94D049BB133111EBULL;
  x ^= x >> 31;
  return x;
}

// ----------------------------------------------------------------------
// MurmurHash3 x64_128, low 64 bits (parity with sketch.murmur3)
// ----------------------------------------------------------------------

inline uint64_t rotl64(uint64_t x, int8_t r) {
  return (x << r) | (x >> (64 - r));
}

inline uint64_t fmix64(uint64_t k) {
  k ^= k >> 33;
  k *= 0xFF51AFD7ED558CCDULL;
  k ^= k >> 33;
  k *= 0xC4CEB9FE1A85EC53ULL;
  k ^= k >> 33;
  return k;
}

uint64_t murmur3_x64_128_low(const uint8_t* data, size_t len, uint32_t seed) {
  const size_t nblocks = len / 16;
  uint64_t h1 = seed, h2 = seed;
  const uint64_t c1 = 0x87C37B91114253D5ULL;
  const uint64_t c2 = 0x4CF5AD432745937FULL;

  for (size_t i = 0; i < nblocks; i++) {
    uint64_t k1, k2;
    std::memcpy(&k1, data + i * 16, 8);
    std::memcpy(&k2, data + i * 16 + 8, 8);

    k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
    h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52DCE729;
    k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
    h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495AB5;
  }

  const uint8_t* tail = data + nblocks * 16;
  uint64_t k1 = 0, k2 = 0;
  switch (len & 15) {
    case 15: k2 ^= ((uint64_t)tail[14]) << 48; [[fallthrough]];
    case 14: k2 ^= ((uint64_t)tail[13]) << 40; [[fallthrough]];
    case 13: k2 ^= ((uint64_t)tail[12]) << 32; [[fallthrough]];
    case 12: k2 ^= ((uint64_t)tail[11]) << 24; [[fallthrough]];
    case 11: k2 ^= ((uint64_t)tail[10]) << 16; [[fallthrough]];
    case 10: k2 ^= ((uint64_t)tail[9]) << 8; [[fallthrough]];
    case 9:
      k2 ^= ((uint64_t)tail[8]);
      k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
      [[fallthrough]];
    case 8: k1 ^= ((uint64_t)tail[7]) << 56; [[fallthrough]];
    case 7: k1 ^= ((uint64_t)tail[6]) << 48; [[fallthrough]];
    case 6: k1 ^= ((uint64_t)tail[5]) << 40; [[fallthrough]];
    case 5: k1 ^= ((uint64_t)tail[4]) << 32; [[fallthrough]];
    case 4: k1 ^= ((uint64_t)tail[3]) << 24; [[fallthrough]];
    case 3: k1 ^= ((uint64_t)tail[2]) << 16; [[fallthrough]];
    case 2: k1 ^= ((uint64_t)tail[1]) << 8; [[fallthrough]];
    case 1:
      k1 ^= ((uint64_t)tail[0]);
      k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
      break;
    case 0: break;
  }

  h1 ^= (uint64_t)len;
  h2 ^= (uint64_t)len;
  h1 += h2;
  h2 += h1;
  h1 = fmix64(h1);
  h2 = fmix64(h2);
  h1 += h2;
  return h1;
}

// ----------------------------------------------------------------------
// FASTA reading (gzip-transparent)
// ----------------------------------------------------------------------

struct FastaRecordC {
  std::string name;  // full header minus '>'
  std::string seq;
};

// Parse FASTA records out of one decompressed buffer (memchr line
// scan — also used by the libdeflate fast path below).
static void parse_fasta_buffer(const char* data, size_t n,
                               std::vector<FastaRecordC>* out) {
  FastaRecordC* cur = nullptr;
  size_t pos = 0;
  while (pos < n) {
    const char* nl = (const char*)memchr(data + pos, '\n', n - pos);
    size_t end = nl ? (size_t)(nl - data) : n;
    size_t line_end = end;
    if (line_end > pos && data[line_end - 1] == '\r') line_end--;
    if (line_end > pos) {
      if (data[pos] == '>') {
        out->emplace_back();
        cur = &out->back();
        cur->name.assign(data + pos + 1, line_end - pos - 1);
      } else if (cur != nullptr) {
        cur->seq.append(data + pos, line_end - pos);
      }
    }
    pos = end + 1;
  }
}

// Whole-buffer multi-member gunzip via the runtime libdeflate API:
// ~2-3x zlib's streaming inflate. Trailing bytes that do not start a
// new gzip member are ignored (matching zlib's gzread behavior, which
// the fallback path below keeps); corruption WITHIN a member errors.
static bool gunzip_all(const std::string& comp, std::string* plain,
                       std::string* err, const char* path) {
  const gzfast::Api& api = gzfast::api();
  void* d = api.alloc();
  if (!d) {
    *err = "libdeflate_alloc_decompressor failed";
    return false;
  }
  size_t off = 0, used = 0;
  plain->resize(std::max<size_t>(comp.size() * 4, 1 << 20));
  bool ok = true;
  while (off + 18 <= comp.size() && (uint8_t)comp[off] == 0x1f &&
         (uint8_t)comp[off + 1] == 0x8b) {
    size_t in_used = 0, out_used = 0;
    const int r =
        api.decompress(d, comp.data() + off, comp.size() - off,
                       &(*plain)[used], plain->size() - used, &in_used,
                       &out_used);
    if (r == gzfast::INSUFFICIENT_SPACE) {
      plain->resize(plain->size() * 2);
      continue;
    }
    if (r != gzfast::SUCCESS) {
      *err = std::string("error reading ") + path +
             ": corrupt gzip stream";
      ok = false;
      break;
    }
    used += out_used;
    off += in_used;
  }
  api.free_d(d);
  plain->resize(used);
  return ok;
}

bool read_fasta_file(const char* path, std::vector<FastaRecordC>* out,
                     std::string* err) {
  struct stat st;
  if (gzfast::api().ok && stat(path, &st) == 0 && S_ISREG(st.st_mode)) {
    // Fast path for regular gzip files only: pipes/FIFOs (never even
    // sniffed — a read here would eat their bytes) and plain files
    // keep the streaming zlib path below.
    FILE* rf = fopen(path, "rb");
    if (!rf) {
      *err = std::string("failed to open ") + path;
      return false;
    }
    const int c0 = fgetc(rf);
    const int c1 = fgetc(rf);
    bool take_fast = (c0 == 0x1f && c1 == 0x8b) &&
                     fseek(rf, 0, SEEK_END) == 0;
    long fsz = -1;
    if (take_fast) {
      fsz = ftell(rf);
      take_fast = fsz > 0 && fseek(rf, 0, SEEK_SET) == 0;
    }
    if (take_fast) {
      std::string comp((size_t)fsz, '\0');
      const size_t got = fread(&comp[0], 1, comp.size(), rf);
      fclose(rf);
      if (got != comp.size()) {
        *err = std::string("error reading ") + path;
        return false;
      }
      std::string plain;
      if (!gunzip_all(comp, &plain, err, path)) return false;
      comp.clear();
      comp.shrink_to_fit();
      parse_fasta_buffer(plain.data(), plain.size(), out);
      return true;
    }
    fclose(rf);  // non-gzip, non-seekable, or empty: stream below
  }
  gzFile f = gzopen(path, "rb");
  if (!f) {
    *err = std::string("failed to open ") + path;
    return false;
  }
  gzbuffer(f, 1 << 20);
  std::string line;
  line.reserve(1 << 16);
  char buf[1 << 16];
  FastaRecordC* cur = nullptr;
  std::string pending;
  // Manual line assembly from gzread chunks (gzgets is slow per line).
  int n;
  auto handle_line = [&](const std::string& ln) {
    if (ln.empty()) return;
    if (ln[0] == '>') {
      out->emplace_back();
      cur = &out->back();
      cur->name = ln.substr(1);
      // strip trailing \r
      if (!cur->name.empty() && cur->name.back() == '\r') cur->name.pop_back();
    } else if (cur != nullptr) {
      size_t end = ln.size();
      if (end && ln[end - 1] == '\r') end--;
      cur->seq.append(ln.data(), end);
    }
  };
  while ((n = gzread(f, buf, sizeof(buf))) > 0) {
    int start = 0;
    for (int i = 0; i < n; i++) {
      if (buf[i] == '\n') {
        if (pending.empty()) {
          handle_line(std::string(buf + start, i - start));
        } else {
          pending.append(buf + start, i - start);
          handle_line(pending);
          pending.clear();
        }
        start = i + 1;
      }
    }
    if (start < n) pending.append(buf + start, n - start);
  }
  if (n < 0) {
    // gzread returns -1 on a stream/CRC error; report it rather than
    // silently truncating the file (the numpy fallback raises too).
    int errnum = 0;
    const char* msg = gzerror(f, &errnum);
    *err = std::string("error reading ") + path + ": " +
           (msg ? msg : "gzread failed");
    gzclose(f);
    return false;
  }
  if (!pending.empty()) handle_line(pending);
  if (gzclose(f) != Z_OK) {
    *err = std::string("error closing ") + path + " (corrupt gzip stream?)";
    return false;
  }
  return true;
}

// ----------------------------------------------------------------------
// Native two-level FracMinHash sketch of a sequence set
// (parity with galah_tpu.sketch.fracminhash.sketch_sequences_native)
// ----------------------------------------------------------------------

struct NativeSketchC {
  int64_t total_len = 0;
  std::vector<int32_t> prefilter_buckets;  // sorted distinct
  std::vector<int32_t> member_buckets;     // sorted distinct
  std::vector<int32_t> frag_buckets;       // flattened per-fragment (deduped)
  std::vector<int64_t> frag_offsets;       // size F+1
};

void fragment_bounds(int64_t length, int64_t L, int64_t min_len,
                     std::vector<int64_t>* bounds) {
  bounds->clear();
  if (length < L) {
    if (length >= min_len) {
      bounds->push_back(0);
      bounds->push_back(length);
    }
    return;
  }
  int64_t nfull = length / L;
  int64_t rem = length - nfull * L;
  for (int64_t i = 0; i <= nfull; i++) bounds->push_back(i * L);
  if (rem >= L / 2) bounds->push_back(length);
}

void sketch_sequences_native_cpp(
    const std::vector<const FastaRecordC*>& seqs, int k, uint64_t gthresh,
    uint64_t fthresh, int64_t frag_len, int64_t min_frag_len,
    uint32_t member_mask, uint32_t pref_mask, NativeSketchC* out) {
  // Invariant (checked at the gt_native_sketch boundary): buckets fit
  // in int31 — the dedup sentinel prev=0xffffffffu must never equal a
  // real bucket, and frag_buckets stores buckets as int32_t.
  const uint64_t kmask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  const int shift_hi = 2 * (k - 1);

  // Genome-level sets as bucket bitmaps, marked directly in the scan
  // loop (the sets live in [0, mask]; a scan of the bitmap emits them
  // sorted-unique). The sort+unique over ~len/fragment_scale pushed
  // hashes this replaces dominated whole-genome sketching. Vectors
  // remain for wide masks and for sequences so short (contig mode)
  // that zeroing/scanning the bitmap would cost more than the sort.
  int64_t total_seq_len = 0;
  for (const FastaRecordC* rec : seqs) total_seq_len += (int64_t)rec->seq.size();
  const bool use_bitmaps = (uint64_t)member_mask + 1 <= (1ULL << 26) &&
                           (uint64_t)pref_mask + 1 <= (1ULL << 26) &&
                           total_seq_len * 16 >= (int64_t)member_mask + 1;
  std::vector<uint64_t> member_bm, pref_bm;
  if (use_bitmaps) {
    member_bm.assign(((size_t)member_mask + 64) / 64, 0);
    pref_bm.assign(((size_t)pref_mask + 64) / 64, 0);
  }
  std::vector<uint64_t> pref, member;
  // Fragment stream as uint32 buckets plus (fragment id, start) run
  // markers: positions ascend, so one fragment's entries are one
  // contiguous run — half the bytes of packed 64-bit keys, and dedup
  // sorts each ~frag_len/scale-entry run instead of the whole stream.
  std::vector<uint32_t> fragbuckets;
  std::vector<std::pair<int64_t, int64_t>> frag_runs;
  std::vector<int64_t> bounds;
  int64_t frag_base = 0;

  for (const FastaRecordC* rec : seqs) {
    const std::string& s = rec->seq;
    const int64_t len = (int64_t)s.size();
    out->total_len += len;
    fragment_bounds(len, frag_len, min_frag_len, &bounds);
    const int64_t nfrag = bounds.empty() ? 0 : (int64_t)bounds.size() - 1;

    if (len >= k) {
      // Three-phase block scan. Phase 1 (serial rolling state) writes
      // canonical k-mers into a block buffer; phase 2 is a plain array
      // loop over mix64 that the compiler vectorizes (~3x the embedded
      // scalar rate); phase 3 does the threshold selection. The mix is
      // computed for invalid windows too (garbage in, discarded by the
      // valid mask) — selection semantics are untouched.
      constexpr int64_t BLK = 8192;
      uint64_t canon_buf[BLK];
      uint64_t hash_buf[BLK];
      uint8_t valid_buf[BLK];
      uint64_t fwd = 0, rev = 0;
      int run = 0;
      int64_t bi = 0;  // current fragment search hint
      for (int64_t blk = 0; blk < len; blk += BLK) {
        const int64_t hi_i = std::min(blk + BLK, len);
        const int64_t nblk = hi_i - blk;
        for (int64_t i = blk; i < hi_i; i++) {
          const uint8_t c = kCode.lut[(uint8_t)s[i]];
          const bool ok = c != INVALID;
          fwd = ((fwd << 2) | (ok ? c : 0)) & kmask;
          rev = (rev >> 2) | (((uint64_t)(3 - (ok ? c : 0))) << shift_hi);
          run = ok ? run + 1 : 0;
          canon_buf[i - blk] = fwd < rev ? fwd : rev;
          valid_buf[i - blk] = run >= k;
        }
        for (int64_t j = 0; j < nblk; j++) hash_buf[j] = mix64(canon_buf[j]);
        for (int64_t j = 0; j < nblk; j++) {
          if (!valid_buf[j]) continue;
          const uint64_t h = hash_buf[j];
          if (h < fthresh) {
            const int64_t pos = blk + j - k + 1;  // kmer start
            const uint64_t mb = h & member_mask;
            if (use_bitmaps)
              member_bm[mb >> 6] |= 1ULL << (mb & 63);
            else
              member.push_back(mb);
            if (nfrag > 0) {
              while (bi + 1 < (int64_t)bounds.size() - 1 &&
                     pos >= bounds[bi + 1])
                bi++;
              if (pos >= bounds[bi] && pos < bounds[bi + 1]) {
                const int64_t fid = frag_base + bi;
                if (frag_runs.empty() || frag_runs.back().first != fid)
                  frag_runs.emplace_back(fid, (int64_t)fragbuckets.size());
                fragbuckets.push_back((uint32_t)mb);
              }
            }
          }
          // Independent of the fragment threshold: parity with the
          // numpy path when gthresh > fthresh.
          if (h < gthresh) {
            const uint64_t pb = h & pref_mask;
            if (use_bitmaps)
              pref_bm[pb >> 6] |= 1ULL << (pb & 63);
            else
              pref.push_back(pb);
          }
        }
      }
    }
    frag_base += nfrag;
  }

  auto sort_unique_to_i32 = [](std::vector<uint64_t>& v,
                               std::vector<int32_t>* dst) {
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
    dst->assign(v.begin(), v.end());
  };
  auto bitmap_to_i32 = [](const std::vector<uint64_t>& bm,
                          std::vector<int32_t>* dst) {
    size_t count = 0;
    for (uint64_t w : bm) count += (size_t)__builtin_popcountll(w);
    dst->clear();
    dst->reserve(count);
    for (size_t wi = 0; wi < bm.size(); wi++) {
      uint64_t w = bm[wi];
      while (w) {
        const int bit = __builtin_ctzll(w);
        dst->push_back((int32_t)(wi * 64 + bit));
        w &= w - 1;
      }
    }
  };
  if (use_bitmaps) {
    bitmap_to_i32(pref_bm, &out->prefilter_buckets);
    bitmap_to_i32(member_bm, &out->member_buckets);
  } else {
    sort_unique_to_i32(pref, &out->prefilter_buckets);
    sort_unique_to_i32(member, &out->member_buckets);
  }

  // Per-run sort + unique (runs carry nondecreasing fragment ids).
  // Comparison sorts pay ~8 mispredicted branches per element on the
  // (uniform, mix64-hashed) bucket values; a one-pass MSB bin scatter
  // cuts that to an insertion sort over ~4-element bins — measured 3x
  // faster than per-run std::sort at MAG shapes (~385-entry runs).
  // Bins are balanced by construction (values are hash outputs);
  // duplicate values cost O(1) shifts each, and a pathological bin
  // still falls back to std::sort.
  out->frag_offsets.assign(frag_base + 1, 0);
  out->frag_buckets.reserve(fragbuckets.size());
  std::vector<uint32_t> sort_tmp;
  uint32_t bin_cnt[257];
  const int value_bits = 32 - __builtin_clz(member_mask | 1);
  for (size_t r = 0; r < frag_runs.size(); r++) {
    const int64_t fid = frag_runs[r].first;
    const int64_t lo = frag_runs[r].second;
    const int64_t hi = (r + 1 < frag_runs.size())
                           ? frag_runs[r + 1].second
                           : (int64_t)fragbuckets.size();
    const int64_t n = hi - lo;
    int64_t n_unique = 0;
    if (n < 64) {
      std::sort(fragbuckets.begin() + lo, fragbuckets.begin() + hi);
      for (int64_t i = lo; i < hi; i++) {
        if (i == lo || fragbuckets[i] != fragbuckets[i - 1]) {
          out->frag_buckets.push_back((int32_t)fragbuckets[i]);
          n_unique++;
        }
      }
    } else {
      // bins ≈ n/4, clamped to [16, 256] and to the value range
      int nb_shift = 4;
      while ((1 << nb_shift) < n / 4 && nb_shift < 8) nb_shift++;
      if (nb_shift > value_bits) nb_shift = value_bits;
      const int nb = 1 << nb_shift;
      const int sh = value_bits - nb_shift;
      if (n > (int64_t)sort_tmp.size()) sort_tmp.resize(n);
      memset(bin_cnt, 0, sizeof(uint32_t) * (nb + 1));
      for (int64_t i = lo; i < hi; i++) bin_cnt[(fragbuckets[i] >> sh) + 1]++;
      for (int b = 0; b < nb; b++) bin_cnt[b + 1] += bin_cnt[b];
      for (int64_t i = lo; i < hi; i++)
        sort_tmp[bin_cnt[fragbuckets[i] >> sh]++] = fragbuckets[i];
      int64_t start = 0;
      uint32_t prev = 0xffffffffu;  // > member_mask: never equals a bucket
      for (int b = 0; b < nb; b++) {
        const int64_t end = bin_cnt[b];
        if (end - start > 1024) {
          std::sort(sort_tmp.begin() + start, sort_tmp.begin() + end);
        } else {
          for (int64_t i = start + 1; i < end; i++) {
            const uint32_t v = sort_tmp[i];
            int64_t j = i - 1;
            while (j >= start && sort_tmp[j] > v) {
              sort_tmp[j + 1] = sort_tmp[j];
              j--;
            }
            sort_tmp[j + 1] = v;
          }
        }
        for (int64_t i = start; i < end; i++) {
          if (sort_tmp[i] != prev) {
            out->frag_buckets.push_back((int32_t)sort_tmp[i]);
            n_unique++;
          }
          prev = sort_tmp[i];
        }
        start = end;
      }
    }
    out->frag_offsets[fid + 1] = n_unique;
  }
  for (int64_t i = 1; i <= frag_base; i++)
    out->frag_offsets[i] += out->frag_offsets[i - 1];
}

// ----------------------------------------------------------------------
// Mash bottom-k sketch (finch parity)
// ----------------------------------------------------------------------

void mash_hashes_cpp(const std::vector<const FastaRecordC*>& seqs, int k,
                     int64_t sketch_size, uint32_t seed,
                     std::vector<uint64_t>* out_hashes) {
  const uint64_t kmask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  const int shift_hi = 2 * (k - 1);
  std::vector<uint64_t> kmers;
  for (const FastaRecordC* rec : seqs) {
    const std::string& s = rec->seq;
    const int64_t len = (int64_t)s.size();
    if (len < k) continue;
    uint64_t fwd = 0, rev = 0;
    int run = 0;
    for (int64_t i = 0; i < len; i++) {
      uint8_t c = kCode.lut[(uint8_t)s[i]];
      if (c == INVALID) {
        run = 0;
        continue;
      }
      fwd = ((fwd << 2) | c) & kmask;
      rev = (rev >> 2) | (((uint64_t)(3 - c)) << shift_hi);
      if (++run < k) continue;
      kmers.push_back(fwd < rev ? fwd : rev);
    }
  }
  std::sort(kmers.begin(), kmers.end());
  kmers.erase(std::unique(kmers.begin(), kmers.end()), kmers.end());

  // hash each distinct canonical kmer's byte-string form
  std::vector<uint64_t> hashes;
  hashes.reserve(kmers.size());
  uint8_t keybuf[32];
  static const char kBases[] = "ACGT";
  for (uint64_t km : kmers) {
    for (int j = 0; j < k; j++) {
      keybuf[j] = (uint8_t)kBases[(km >> (2 * (k - 1 - j))) & 3];
    }
    hashes.push_back(murmur3_x64_128_low(keybuf, (size_t)k, seed));
  }
  std::sort(hashes.begin(), hashes.end());
  hashes.erase(std::unique(hashes.begin(), hashes.end()), hashes.end());
  if ((int64_t)hashes.size() > sketch_size) hashes.resize(sketch_size);
  *out_hashes = std::move(hashes);
}

// ----------------------------------------------------------------------
// Genome stats (parity with src/genome_stats.rs:11-51)
// ----------------------------------------------------------------------

void genome_stats_cpp(const std::vector<FastaRecordC>& recs,
                      int64_t out_stats[3]) {
  int64_t num_contigs = 0, num_ambiguous = 0, total = 0;
  std::vector<int64_t> lengths;
  for (const auto& r : recs) {
    num_contigs++;
    lengths.push_back((int64_t)r.seq.size());
    total += (int64_t)r.seq.size();
    for (char ch : r.seq)
      if (ch == 'N' || ch == 'n') num_ambiguous++;
  }
  std::sort(lengths.begin(), lengths.end());
  const int64_t cutoff = total / 2;
  int64_t acc = 0, n50 = 0;
  for (int64_t L : lengths) {
    acc += L;
    if (acc >= cutoff) {
      n50 = L;
      break;
    }
  }
  out_stats[0] = num_contigs;
  out_stats[1] = num_ambiguous;
  out_stats[2] = n50;
}

// ----------------------------------------------------------------------
// Handle-based C API
// ----------------------------------------------------------------------

struct GtHandle {
  std::string error;
  std::vector<FastaRecordC> records;
  // one sketch per unit (1 for genome mode, n_contigs for contig mode)
  std::vector<NativeSketchC> sketches;
  std::vector<uint64_t> mash_hashes;
};

}  // namespace

extern "C" {

void* gt_open(const char* path) {
  auto* h = new GtHandle();
  if (!read_fasta_file(path, &h->records, &h->error)) {
    // keep handle so the error can be queried
    h->records.clear();
  }
  return h;
}

const char* gt_error(void* handle) {
  auto* h = (GtHandle*)handle;
  return h->error.empty() ? nullptr : h->error.c_str();
}

void gt_close(void* handle) { delete (GtHandle*)handle; }

int64_t gt_num_records(void* handle) {
  return (int64_t)((GtHandle*)handle)->records.size();
}

const char* gt_record_name(void* handle, int64_t i) {
  return ((GtHandle*)handle)->records[(size_t)i].name.c_str();
}

int64_t gt_record_seq_len(void* handle, int64_t i) {
  return (int64_t)((GtHandle*)handle)->records[(size_t)i].seq.size();
}

void gt_record_seq_copy(void* handle, int64_t i, char* dst) {
  const auto& s = ((GtHandle*)handle)->records[(size_t)i].seq;
  std::memcpy(dst, s.data(), s.size());
}

void gt_genome_stats(void* handle, int64_t out_stats[3]) {
  genome_stats_cpp(((GtHandle*)handle)->records, out_stats);
}

// mode 0: whole genome (one sketch); mode 1: per contig.
// threads > 1 parallelizes mode 1 across contigs (each contig's sketch
// is independent; results land at fixed indices, so output is
// deterministic regardless of thread count).
int64_t gt_native_sketch(void* handle, int mode, int k, uint64_t gthresh,
                         uint64_t fthresh, int64_t frag_len,
                         int64_t min_frag_len, uint32_t member_mask,
                         uint32_t pref_mask, int threads) {
  auto* h = (GtHandle*)handle;
  h->sketches.clear();
  // Buckets must fit in int31: the per-fragment dedup's sentinel
  // (0xffffffffu) and its (int32_t) stores require member/prefilter
  // bucket values < 2^31. Power-of-two masks <= 2^22 hold everywhere
  // in galah_tpu (defaults.py); reject wider masks instead of
  // corrupting output silently.
  if (member_mask >= 0x80000000u || pref_mask >= 0x80000000u) return -1;
  if (mode == 0) {
    std::vector<const FastaRecordC*> all;
    for (const auto& r : h->records) all.push_back(&r);
    h->sketches.emplace_back();
    sketch_sequences_native_cpp(all, k, gthresh, fthresh, frag_len,
                                min_frag_len, member_mask, pref_mask,
                                &h->sketches.back());
  } else {
    const int64_t n = (int64_t)h->records.size();
    h->sketches.resize((size_t)n);
    auto sketch_one = [&](int64_t i) {
      std::vector<const FastaRecordC*> one{&h->records[(size_t)i]};
      sketch_sequences_native_cpp(one, k, gthresh, fthresh, frag_len,
                                  min_frag_len, member_mask, pref_mask,
                                  &h->sketches[(size_t)i]);
    };
    int nthreads = threads < 1 ? 1 : threads;
    if (nthreads > n) nthreads = (int)n;
    if (nthreads <= 1) {
      for (int64_t i = 0; i < n; i++) sketch_one(i);
    } else {
      // dynamic chunks: contig lengths vary wildly, static partition
      // would straggle on a few long contigs
      constexpr int64_t kChunk = 16;
      std::atomic<int64_t> next{0};
      auto worker = [&]() {
        for (;;) {
          const int64_t lo = next.fetch_add(kChunk);
          if (lo >= n) return;
          const int64_t hi = lo + kChunk < n ? lo + kChunk : n;
          for (int64_t i = lo; i < hi; i++) sketch_one(i);
        }
      };
      std::vector<std::thread> pool;
      pool.reserve((size_t)nthreads);
      for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
      for (auto& th : pool) th.join();
    }
  }
  return (int64_t)h->sketches.size();
}

// sizes: [total_len, n_pref, n_member, n_fragbuckets, n_frag_offsets]
void gt_sketch_sizes(void* handle, int64_t i, int64_t out_sizes[5]) {
  const auto& s = ((GtHandle*)handle)->sketches[(size_t)i];
  out_sizes[0] = s.total_len;
  out_sizes[1] = (int64_t)s.prefilter_buckets.size();
  out_sizes[2] = (int64_t)s.member_buckets.size();
  out_sizes[3] = (int64_t)s.frag_buckets.size();
  out_sizes[4] = (int64_t)s.frag_offsets.size();
}

void gt_sketch_copy(void* handle, int64_t i, int32_t* pref, int32_t* member,
                    int32_t* fragbuckets, int64_t* frag_offsets) {
  const auto& s = ((GtHandle*)handle)->sketches[(size_t)i];
  std::memcpy(pref, s.prefilter_buckets.data(),
              s.prefilter_buckets.size() * sizeof(int32_t));
  std::memcpy(member, s.member_buckets.data(),
              s.member_buckets.size() * sizeof(int32_t));
  std::memcpy(fragbuckets, s.frag_buckets.data(),
              s.frag_buckets.size() * sizeof(int32_t));
  std::memcpy(frag_offsets, s.frag_offsets.data(),
              s.frag_offsets.size() * sizeof(int64_t));
}

// Bulk transfer: one call for all sketches (a 100k-contig file would
// otherwise pay 200k ctypes round trips). out_totals = summed
// [n_pref, n_member, n_fragbuckets, n_frag_offsets] over all sketches.
void gt_sketch_bulk_sizes(void* handle, int64_t out_totals[4]) {
  auto* h = (GtHandle*)handle;
  int64_t t[4] = {0, 0, 0, 0};
  for (const auto& s : h->sketches) {
    t[0] += (int64_t)s.prefilter_buckets.size();
    t[1] += (int64_t)s.member_buckets.size();
    t[2] += (int64_t)s.frag_buckets.size();
    t[3] += (int64_t)s.frag_offsets.size();
  }
  std::memcpy(out_totals, t, sizeof(t));
}

// meta: (n_sketches, 5) row-major
// [total_len, n_pref, n_member, n_fragbuckets, n_frag_offsets];
// the array arguments receive every sketch's data concatenated in
// sketch order (caller splits with cumulative sums of the meta rows).
void gt_sketch_bulk_copy(void* handle, int64_t* meta, int32_t* pref,
                         int32_t* member, int32_t* fragbuckets,
                         int64_t* frag_offsets) {
  auto* h = (GtHandle*)handle;
  for (const auto& s : h->sketches) {
    meta[0] = s.total_len;
    meta[1] = (int64_t)s.prefilter_buckets.size();
    meta[2] = (int64_t)s.member_buckets.size();
    meta[3] = (int64_t)s.frag_buckets.size();
    meta[4] = (int64_t)s.frag_offsets.size();
    meta += 5;
    std::memcpy(pref, s.prefilter_buckets.data(),
                s.prefilter_buckets.size() * sizeof(int32_t));
    pref += s.prefilter_buckets.size();
    std::memcpy(member, s.member_buckets.data(),
                s.member_buckets.size() * sizeof(int32_t));
    member += s.member_buckets.size();
    std::memcpy(fragbuckets, s.frag_buckets.data(),
                s.frag_buckets.size() * sizeof(int32_t));
    fragbuckets += s.frag_buckets.size();
    std::memcpy(frag_offsets, s.frag_offsets.data(),
                s.frag_offsets.size() * sizeof(int64_t));
    frag_offsets += s.frag_offsets.size();
  }
}

int64_t gt_mash_sketch(void* handle, int k, int64_t sketch_size,
                       uint32_t seed) {
  auto* h = (GtHandle*)handle;
  std::vector<const FastaRecordC*> all;
  for (const auto& r : h->records) all.push_back(&r);
  mash_hashes_cpp(all, k, sketch_size, seed, &h->mash_hashes);
  return (int64_t)h->mash_hashes.size();
}

void gt_mash_copy(void* handle, uint64_t* dst) {
  const auto& v = ((GtHandle*)handle)->mash_hashes;
  std::memcpy(dst, v.data(), v.size() * sizeof(uint64_t));
}

uint64_t gt_murmur3_x64_128_low(const uint8_t* data, int64_t len,
                                uint32_t seed) {
  return murmur3_x64_128_low(data, (size_t)len, seed);
}

}  // extern "C"
