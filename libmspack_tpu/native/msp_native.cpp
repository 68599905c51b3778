// Native host runtime for libmspack_tpu: multithreaded codec engine.
//
// The TPU owns the MXU/VPU-friendly passes (CRC, checksums, E8, batch
// transforms, device-resident delivery); entropy decoding is a scalar /
// random-access workload, so the framework's host runtime does it in
// C++ with a thread pool — the reference library is strictly
// single-threaded (libmspack mspack.h threading notes), which is the
// baseline this engine is designed to beat.
//
// Architecture (two-phase, mirroring the device pipeline):
//   phase A: per-frame DEFLATE tokenisation (independent -> threaded)
//   phase B: per-folder sequential token resolution at memcpy speed
//            (MSZIP history crosses frames through the 32 KiB window,
//            so resolution is ordered within a folder; folders thread)
//
// Exposed as a flat C ABI consumed via ctypes (no pybind11 in image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kFrameSize = 32768;

// ---------------------------------------------------------------- bits
struct BitIn {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t buf = 0;
  int n = 0;
  int64_t virtual_zeros = 0;  // bits consumed past the end

  const uint8_t* end8;  // last position where an 8-byte load is safe

  explicit BitIn(const uint8_t* data, size_t len)
      : p(data), end(data + len), end8(len >= 8 ? data + len - 8 : data - 1) {}

  inline void fill() {
    if (p <= end8) {
      // branch-free style refill: one unaligned 64-bit load tops the
      // buffer up to >= 56 bits
      uint64_t w;
      memcpy(&w, p, 8);
      buf |= w << n;
      p += (63 - n) >> 3;
      n |= 56;
      return;
    }
    while (n <= 56) {
      if (p < end) {
        buf |= (uint64_t)(*p++) << n;
        n += 8;
      } else {
        virtual_zeros += 64 - n;
        n = 64;  // implicit zero bytes; consumption tracked
        break;
      }
    }
  }
  inline uint32_t peek(int k) { return (uint32_t)(buf & ((1u << k) - 1)); }
  inline void drop(int k) { buf >>= k; n -= k; }
  inline uint32_t get(int k) {
    if (n < k) fill();
    uint32_t v = peek(k);
    drop(k);
    return v;
  }
  // consumed bits beyond the stream end (reference allows 16: the two
  // fake zero bytes of readbits.h read_input)
  inline bool overran(const uint8_t* start, size_t len) const {
    int64_t filled = (int64_t)(p - start) * 8 + virtual_zeros;
    int64_t consumed = filled - n;
    return consumed > (int64_t)len * 8 + 16;
  }
};

// ------------------------------------------------------------- huffman
// Two-level decode table: 10-bit root; long codes chain to subtables.
// Entry layout: sym(16) | len(8) | is_sub(1); for is_sub entries the
// sym field is the subtable offset and len the subtable bit width.
struct Huff {
  std::vector<uint32_t> tab;
  int root_bits = 10;
  bool ok = false;

  static constexpr uint32_t kSub = 1u << 24;

  bool build(const uint8_t* lens, int nsyms) {
    tab.assign(1u << root_bits, 0xFFFFFFFFu);
    int count[16] = {0};
    for (int s = 0; s < nsyms; s++) count[lens[s]]++;
    count[0] = 0;
    uint32_t code = 0;
    uint32_t next_code[16] = {0};
    int64_t kraft = 0;
    for (int b = 1; b <= 15; b++) {
      code = (code + count[b - 1]) << 1;
      next_code[b] = code;
      kraft += (int64_t)count[b] << (15 - b);
    }
    if (kraft > (1 << 15)) return ok = false;  // over-subscribed

    // assign codes; fill root + subtables
    for (int s = 0; s < nsyms; s++) {
      int L = lens[s];
      if (!L) continue;
      uint32_t c = next_code[L]++;
      // bit-reverse the L-bit code (stream is LSB-first)
      uint32_t r = 0;
      for (int i = 0; i < L; i++) r |= ((c >> i) & 1u) << (L - 1 - i);
      if (L <= root_bits) {
        uint32_t entry = (uint32_t)s | ((uint32_t)L << 16);
        for (uint32_t i = r; i < tab.size() && i < (1u << root_bits);
             i += (1u << L))
          tab[i] = entry;
      } else {
        uint32_t rootIdx = r & ((1u << root_bits) - 1);
        int extra = L - root_bits;
        // allocate / locate subtable covering 5 extra bits (max 15-10)
        uint32_t subBase;
        if (tab[rootIdx] == 0xFFFFFFFFu || !(tab[rootIdx] & kSub)) {
          subBase = (uint32_t)tab.size();
          tab.resize(tab.size() + 32, 0xFFFFFFFFu);
          tab[rootIdx] = kSub | subBase;
        } else {
          subBase = tab[rootIdx] & 0xFFFFFFu;
        }
        uint32_t hi = r >> root_bits;  // extra bits (LSB-first), < 32
        uint32_t entry = (uint32_t)s | ((uint32_t)L << 16);
        for (uint32_t i = hi; i < 32; i += (1u << extra))
          tab[subBase + i] = entry;
      }
    }
    return ok = true;
  }

  // decode one symbol; returns sym or -1
  inline int decode(BitIn& b) const {
    if (b.n < 15) b.fill();
    uint32_t e = tab[b.peek(root_bits)];
    if (e == 0xFFFFFFFFu) return -1;
    if (e & kSub) {
      uint32_t sub = e & 0xFFFFFFu;
      e = tab[sub + ((b.buf >> root_bits) & 31)];
      if (e == 0xFFFFFFFFu) return -1;
    }
    b.drop((e >> 16) & 0xFF);
    return (int)(e & 0xFFFF);
  }
};

// --------------------------------------------------------- deflate A
static const uint16_t kLitBase[29] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 13,
                                      15, 17, 19, 23, 27, 31, 35, 43, 51,
                                      59, 67, 83, 99, 115, 131, 163, 195,
                                      227, 258};
static const uint8_t kLitExtra[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1,
                                      1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
                                      4, 4, 4, 4, 5, 5, 5, 5, 0};
static const uint16_t kDistBase[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25,
                                       33, 49, 65, 97, 129, 193, 257, 385,
                                       513, 769, 1025, 1537, 2049, 3073,
                                       4097, 6145, 8193, 12289, 16385, 24577};
static const uint8_t kDistExtra[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
                                       4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
                                       9, 9, 10, 10, 11, 11, 12, 12, 13, 13};
static const uint8_t kBitlenOrder[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                                         11, 4, 12, 3, 13, 2, 14, 1, 15};

// Tokenised frame: literal bytes packed densely + command stream.
// command u32: lo16 = length; hi16 = distance (0 => literal run).
struct FrameTokens {
  std::vector<uint8_t> lits;
  std::vector<uint32_t> cmds;
  uint32_t out_len = 0;
  int err = 0;  // 0 ok
};

// Tokenise one complete MSZIP frame (a standalone deflate stream).
static void tokenize_frame(const uint8_t* data, size_t len, FrameTokens* ft) {
  BitIn b(data, len);
  ft->out_len = 0;
  ft->err = 0;
  ft->lits.resize(kFrameSize);      // a frame emits at most 32768 bytes
  ft->cmds.reserve(4096);
  uint8_t* litp = ft->lits.data();
  uint8_t* lit_end = litp + kFrameSize;
  uint32_t pending_lits = 0;
  auto flush_lits = [&]() {
    while (pending_lits) {
      uint32_t run = pending_lits > 0xFFFF ? 0xFFFF : pending_lits;
      ft->cmds.push_back(run);
      pending_lits -= run;
    }
  };

  for (;;) {
    uint32_t last = b.get(1);
    uint32_t type = b.get(2);
    if (type == 0) {
      // stored block
      int align = b.n & 7;
      b.drop(align);
      uint32_t l = b.get(16);
      uint32_t nl = b.get(16);
      if (l != ((~nl) & 0xFFFF)) { ft->err = 2; return; }
      if (litp + l > lit_end) { ft->err = 12; return; }
      for (uint32_t i = 0; i < l; i++) *litp++ = (uint8_t)b.get(8);
      pending_lits += l;
      ft->out_len += l;
    } else if (type == 1 || type == 2) {
      Huff lit, dist;
      if (type == 1) {
        uint8_t ll[288], dl[32];
        int i = 0;
        for (; i < 144; i++) ll[i] = 8;
        for (; i < 256; i++) ll[i] = 9;
        for (; i < 280; i++) ll[i] = 7;
        for (; i < 288; i++) ll[i] = 8;
        for (i = 0; i < 32; i++) dl[i] = 5;
        if (!lit.build(ll, 288) || !dist.build(dl, 32)) { ft->err = 3; return; }
      } else {
        uint32_t nlit = b.get(5) + 257;
        uint32_t ndist = b.get(5) + 1;
        uint32_t nbl = b.get(4) + 4;
        if (nlit > 288 || ndist > 32) { ft->err = 4; return; }
        uint8_t bl[19] = {0};
        for (uint32_t i = 0; i < nbl; i++) bl[kBitlenOrder[i]] = (uint8_t)b.get(3);
        Huff blh;
        if (!blh.build(bl, 19)) { ft->err = 5; return; }
        uint8_t lens[320] = {0};
        uint32_t total = nlit + ndist;
        uint32_t i = 0;
        uint8_t prev = 0;
        while (i < total) {
          int c = blh.decode(b);
          if (c < 0) { ft->err = 6; return; }
          if (c < 16) { lens[i++] = prev = (uint8_t)c; continue; }
          uint32_t run, fill = 0;
          if (c == 16) { run = b.get(2) + 3; fill = prev; }
          else if (c == 17) { run = b.get(3) + 3; }
          else { run = b.get(7) + 11; }
          if (i + run > total) { ft->err = 7; return; }
          while (run--) lens[i++] = (uint8_t)fill;
        }
        if (!lit.build(lens, nlit) || !dist.build(lens + nlit, ndist)) {
          ft->err = 8; return;
        }
      }
      for (;;) {
        int s = lit.decode(b);
        if (s < 0) { ft->err = 9; return; }
        if (s < 256) {
          if (litp >= lit_end) { ft->err = 12; return; }
          *litp++ = (uint8_t)s;
          pending_lits++;
          ft->out_len++;
        } else if (s == 256) {
          break;
        } else {
          s -= 257;
          if (s >= 29) { ft->err = 10; return; }
          uint32_t l = kLitBase[s] + b.get(kLitExtra[s]);
          int d = dist.decode(b);
          if (d < 0 || d >= 30) { ft->err = 11; return; }
          uint32_t dd = kDistBase[d] + b.get(kDistExtra[d]);
          flush_lits();
          ft->cmds.push_back(l | (dd << 16));
          ft->out_len += l;
        }
        if (ft->out_len > (uint32_t)kFrameSize) { ft->err = 12; return; }
      }
    } else {
      ft->err = 1;
      return;
    }
    if (last) break;
  }
  flush_lits();
  ft->lits.resize((size_t)(litp - ft->lits.data()));
  if (b.overran(data, len)) ft->err = 13;
}

// --------------------------------------------------------- phase B
// Apply a folder's token streams into `out`; matches may reach back
// across frame boundaries (dist <= 32768 into earlier output).
static int resolve_folder(const FrameTokens* frames, int n_frames,
                          uint8_t* out, size_t out_cap) {
  size_t pos = 0;
  for (int fi = 0; fi < n_frames; fi++) {
    const FrameTokens& ft = frames[fi];
    if (ft.err) return ft.err;
    const uint8_t* lit = ft.lits.data();
    for (uint32_t cmd : ft.cmds) {
      uint32_t l = cmd & 0xFFFF;
      uint32_t d = cmd >> 16;
      if (pos + l > out_cap) return 20;
      if (d == 0) {
        memcpy(out + pos, lit, l);
        lit += l;
        pos += l;
      } else {
        if (d > pos) return 21;
        const uint8_t* src = out + pos - d;
        uint8_t* dst = out + pos;
        if (d >= l) {
          memcpy(dst, src, l);
        } else if (d >= 8) {
          size_t done = 0;
          while (done < l) {
            size_t chunk = d < (l - done) ? d : (l - done);
            memcpy(dst + done, src + done, chunk);
            done += chunk;
          }
        } else {
          for (uint32_t i = 0; i < l; i++) dst[i] = src[i];
        }
        pos += l;
      }
    }
  }
  return 0;
}

struct FolderJob {
  const uint8_t* const* frames;
  const uint64_t* frame_lens;
  const uint32_t* sizes;
  int n_frames;
  uint8_t* out;
  uint64_t out_cap;
  int result = -1;
};

}  // namespace

extern "C" {

// Decode one MSZIP folder: frames[i] are the deflate streams (CK
// stripped), sizes[i] their expected output lengths. Thread-parallel
// phase A, sequential phase B. Returns 0 on success.
int msp_mszip_folder(const uint8_t* const* frames, const uint64_t* frame_lens,
                     const uint32_t* sizes, int n_frames, uint8_t* out,
                     uint64_t out_cap, int n_threads) {
  std::vector<FrameTokens> toks(n_frames);
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_frames) break;
      tokenize_frame(frames[i], frame_lens[i], &toks[i]);
    }
  };
  if (n_threads == 1 || n_frames == 1) {
    worker();
  } else {
    std::vector<std::thread> ths;
    int nt = n_threads < n_frames ? n_threads : n_frames;
    for (int t = 0; t < nt; t++) ths.emplace_back(worker);
    for (auto& t : ths) t.join();
  }
  uint64_t total = 0;
  for (int i = 0; i < n_frames; i++) {
    if (toks[i].err) return 100 + toks[i].err;
    if (toks[i].out_len != sizes[i]) return 99;
    total += sizes[i];
  }
  if (total > out_cap) return 98;
  return resolve_folder(toks.data(), n_frames, out, out_cap);
}

// Decode many folders concurrently (folder-level + frame-level threads).
// frame_ptrs/frame_lens are flattened; folder_offsets[i] is the first
// frame index of folder i (n_folders+1 entries, last = total frames).
// out_offsets[i] similarly into `out`.
int msp_mszip_folders(const uint8_t* const* frame_ptrs,
                      const uint64_t* frame_lens, const uint32_t* sizes,
                      const int64_t* folder_offsets, int n_folders,
                      uint8_t* out, const int64_t* out_offsets,
                      int n_threads) {
  // phase A over ALL frames with one pool
  int64_t total_frames = folder_offsets[n_folders];
  std::vector<FrameTokens> toks(total_frames);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= total_frames) break;
      tokenize_frame(frame_ptrs[i], frame_lens[i], &toks[i]);
    }
  };
  int nt = n_threads < 1 ? 1 : n_threads;
  {
    std::vector<std::thread> ths;
    for (int t = 0; t < nt; t++) ths.emplace_back(worker);
    for (auto& t : ths) t.join();
  }
  // validate
  for (int64_t i = 0; i < total_frames; i++) {
    if (toks[i].err) return 100 + toks[i].err;
    if (toks[i].out_len != sizes[i]) return 99;
  }
  // phase B per folder, folder-parallel
  std::atomic<int> nf(0);
  std::atomic<int> err(0);
  auto resolver = [&]() {
    for (;;) {
      int f = nf.fetch_add(1);
      if (f >= n_folders) break;
      int r = resolve_folder(
          toks.data() + folder_offsets[f],
          (int)(folder_offsets[f + 1] - folder_offsets[f]),
          out + out_offsets[f],
          (uint64_t)(out_offsets[f + 1] - out_offsets[f]));
      if (r) err.store(r);
    }
  };
  {
    std::vector<std::thread> ths;
    int nt2 = nt < n_folders ? nt : n_folders;
    for (int t = 0; t < nt2; t++) ths.emplace_back(resolver);
    for (auto& t : ths) t.join();
  }
  return err.load();
}

// LZSS one-shot decode (SZDD/KWAJ/HLP variants), mode as in lzss.py.
int64_t msp_lzss(const uint8_t* in, uint64_t in_len, int mode, uint8_t* out,
                 uint64_t out_cap) {
  uint8_t window[4096];
  memset(window, 0x20, sizeof(window));
  uint32_t pos = mode == 2 ? 4096 - 18 : 4096 - 16;
  uint8_t invert = mode == 1 ? 0xFF : 0x00;
  uint64_t i = 0, o = 0;
  while (i < in_len) {
    uint8_t c = in[i++] ^ invert;
    for (int bit = 0; bit < 8; bit++) {
      if (c & (1 << bit)) {
        if (i >= in_len) return (int64_t)o;
        uint8_t v = in[i++];
        window[pos] = v;
        if (o < out_cap) out[o] = v;
        o++;
        pos = (pos + 1) & 4095;
      } else {
        if (i + 1 >= in_len) return (int64_t)o;
        uint32_t mpos = in[i] | ((in[i + 1] & 0xF0) << 4);
        uint32_t len = (in[i + 1] & 0x0F) + 3;
        i += 2;
        while (len--) {
          uint8_t v = window[mpos];
          window[pos] = v;
          if (o < out_cap) out[o] = v;
          o++;
          pos = (pos + 1) & 4095;
          mpos = (mpos + 1) & 4095;
        }
      }
    }
  }
  return (int64_t)o;
}

// profiling aid: tokenize all frames, skip resolution
int msp_mszip_tokenize_only(const uint8_t* const* frames,
                            const uint64_t* frame_lens, int n_frames,
                            int n_threads) {
  std::vector<FrameTokens> toks(n_frames);
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_frames) break;
      tokenize_frame(frames[i], frame_lens[i], &toks[i]);
    }
  };
  std::vector<std::thread> ths;
  int nt = n_threads < 1 ? 1 : n_threads;
  for (int t = 0; t < nt; t++) ths.emplace_back(worker);
  for (auto& t : ths) t.join();
  int64_t total = 0;
  for (auto& t : toks) total += t.out_len;
  return (int)(total & 0x7FFFFFFF);
}

int msp_version(void) { return 1; }

}  // extern "C"
