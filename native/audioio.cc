// Native audio decode + batched data-loader for fithubert_tpu.
//
// The reference delegates flac decoding to torchaudio/libsox
// (reference utils/dataset.py:59-61) and parallelizes with torch DataLoader
// worker processes (reference train.py:423-428). Here the decoder itself is
// native: a self-contained FLAC (subset used by LibriSpeech: 16-bit PCM,
// constant/verbatim/fixed/LPC subframes, rice residuals, all stereo modes)
// and WAV (PCM 16/24/32, float32) reader, plus a std::thread batch loader
// that fills a padded (B, T) float32 buffer in parallel — called from Python
// over ctypes (the call releases the GIL for its whole duration).
//
// Build: make -C native   ->  native/build/libaudioio.so
//
// C ABI:
//   audioio_decode(path, out, cap, *sr) -> n_samples (query with out=NULL)
//   audioio_load_batch(paths, n, out, t_pad, lengths, n_threads) -> 0/-1
//
// No external dependencies beyond the C++17 standard library.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- bit reader
struct BitReader {
  const uint8_t* data;
  size_t size;     // bytes
  size_t bit = 0;  // absolute bit position

  bool ok() const { return bit <= size * 8; }
  bool eof() const { return bit >= size * 8; }

  uint32_t read_bit() {
    if (eof()) { bit++; return 0; }
    uint32_t b = (data[bit >> 3] >> (7 - (bit & 7))) & 1;
    bit++;
    return b;
  }

  uint64_t read_bits(int n) {  // n <= 64
    uint64_t v = 0;
    while (n > 0) {
      if (eof()) { bit += n; return v << n; }
      int avail = 8 - (bit & 7);
      int take = n < avail ? n : avail;
      uint32_t byte = data[bit >> 3];
      uint32_t chunk = (byte >> (avail - take)) & ((1u << take) - 1);
      v = (v << take) | chunk;
      bit += take;
      n -= take;
    }
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n == 0) return 0;
    if (v & (1ull << (n - 1))) return (int64_t)(v - (1ull << n));
    return (int64_t)v;
  }

  uint64_t read_unary() {  // count zero bits before the terminating 1
    uint64_t q = 0;
    while (!eof() && read_bit() == 0) q++;
    return q;
  }

  void align_byte() { bit = (bit + 7) & ~size_t(7); }
};

// ------------------------------------------------------------- FLAC decoding
struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bps = 0;
  uint64_t total_samples = 0;
};

bool read_streaminfo(const uint8_t* d, size_t n, StreamInfo* si, size_t* frames_off) {
  if (n < 4 || memcmp(d, "fLaC", 4) != 0) return false;
  size_t off = 4;
  bool last = false;
  while (!last && off + 4 <= n) {
    uint8_t hdr = d[off];
    last = hdr & 0x80;
    uint8_t type = hdr & 0x7f;
    uint32_t len = (d[off + 1] << 16) | (d[off + 2] << 8) | d[off + 3];
    off += 4;
    if (type == 0 && len >= 34 && off + 34 <= n) {
      const uint8_t* p = d + off;
      si->sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
      si->channels = ((p[12] >> 1) & 0x7) + 1;
      si->bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      si->total_samples = ((uint64_t)(p[13] & 0x0f) << 32) | ((uint64_t)p[14] << 24) |
                          (p[15] << 16) | (p[16] << 8) | p[17];
    }
    off += len;
  }
  *frames_off = off;
  return si->sample_rate != 0;
}

// decode one rice-coded residual partition set into res[0..blocksize-order)
bool read_residual(BitReader& br, int blocksize, int order, std::vector<int64_t>& res) {
  uint32_t method = br.read_bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = br.read_bits(4);
  uint32_t parts = 1u << porder;
  int idx = 0;
  for (uint32_t p = 0; p < parts; p++) {
    int count = (blocksize >> porder) - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = br.read_bits(plen);
    if (param == escape) {
      uint32_t raw = br.read_bits(5);
      for (int i = 0; i < count; i++) res[idx++] = br.read_signed(raw);
    } else {
      for (int i = 0; i < count; i++) {
        uint64_t q = br.read_unary();
        uint64_t r = br.read_bits(param);
        uint64_t u = (q << param) | r;
        res[idx++] = (u & 1) ? -(int64_t)((u + 1) >> 1) : (int64_t)(u >> 1);
      }
    }
    if (!br.ok()) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int blocksize, int bps, std::vector<int64_t>& out) {
  if (br.read_bit() != 0) return false;  // reserved
  uint32_t type = br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) wasted = 1 + (int)br.read_unary();
  bps -= wasted;

  out.resize(blocksize);
  if (type == 0) {  // constant
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < blocksize; i++) out[i] = v;
  } else if (type == 1) {  // verbatim
    for (int i = 0; i < blocksize; i++) out[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // fixed, order = type - 8
    int order = type - 8;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    std::vector<int64_t> res(blocksize - order);
    if (!read_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t r = res[i - order];
      switch (order) {
        case 0: out[i] = r; break;
        case 1: out[i] = r + out[i - 1]; break;
        case 2: out[i] = r + 2 * out[i - 1] - out[i - 2]; break;
        case 3: out[i] = r + 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        default: out[i] = r + 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
      }
    }
  } else if (type >= 32) {  // LPC, order = type - 31
    int order = (int)type - 31;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    int precision = (int)br.read_bits(4) + 1;
    if (precision == 16) return false;  // 0b1111 is invalid
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; i++) coef[i] = br.read_signed(precision);
    std::vector<int64_t> res(blocksize - order);
    if (!read_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++) acc += coef[j] * out[i - j - 1];
      out[i] = res[i - order] + (acc >> shift);
    }
  } else {
    return false;
  }
  if (wasted) for (auto& v : out) v <<= wasted;
  return br.ok();
}

// Decode an entire FLAC stream to mono float32. Returns sample count, -1 on error.
int64_t decode_flac(const uint8_t* d, size_t n, float* out, int64_t cap, int* sr) {
  StreamInfo si;
  size_t off = 0;
  if (!read_streaminfo(d, n, &si, &off)) return -1;
  if (si.channels < 1 || si.channels > 2 || si.bps < 4 || si.bps > 32) return -1;
  *sr = (int)si.sample_rate;
  if (out == nullptr) {
    if (si.total_samples > 0) return (int64_t)si.total_samples;
    // unknown length: fall through and count by decoding with out=null cap=0
  }

  BitReader br{d + off, n - off, 0};
  std::vector<int64_t> ch0, ch1;
  const float scale = 1.0f / (float)(1u << (si.bps - 1));
  int64_t written = 0;

  while (true) {
    br.align_byte();
    // scan for the 14-bit frame sync at a byte boundary
    while (!br.eof()) {
      size_t byte = br.bit >> 3;
      if (byte + 1 < br.size && br.data[byte] == 0xFF &&
          (br.data[byte + 1] & 0xFC) == 0xF8)
        break;
      br.bit += 8;
    }
    if (br.eof()) break;

    br.read_bits(14);                 // sync
    br.read_bit();                    // reserved
    br.read_bit();                    // blocking strategy
    uint32_t bs_code = br.read_bits(4);
    uint32_t sr_code = br.read_bits(4);
    uint32_t ch_code = br.read_bits(4);
    uint32_t ss_code = br.read_bits(3);
    br.read_bit();                    // reserved
    // UTF-8 coded frame/sample number
    uint32_t lead = br.read_bits(8);
    int extra = 0;
    for (uint32_t m = 0x80; lead & m; m >>= 1) extra++;
    if (extra > 0) extra -= 1;
    for (int i = 0; i < extra; i++) br.read_bits(8);

    int blocksize;
    switch (bs_code) {
      case 0: return -1;
      case 1: blocksize = 192; break;
      case 6: blocksize = (int)br.read_bits(8) + 1; break;
      case 7: blocksize = (int)br.read_bits(16) + 1; break;
      default:
        blocksize = bs_code <= 5 ? (576 << (bs_code - 2)) : (256 << (bs_code - 8));
    }
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    int bps = (int)si.bps;
    switch (ss_code) {
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: break;  // 0 -> streaminfo
    }
    br.read_bits(8);  // CRC-8

    int channels = (int)si.channels;
    bool left_side = false, right_side = false, mid_side = false;
    if (ch_code <= 7) channels = (int)ch_code + 1;
    else if (ch_code == 8) { channels = 2; left_side = true; }
    else if (ch_code == 9) { channels = 2; right_side = true; }
    else if (ch_code == 10) { channels = 2; mid_side = true; }
    else return written > 0 ? written : -1;

    if (channels > 2 || blocksize <= 0 || blocksize > 65536)
      return written > 0 ? written : -1;

    // the side channel carries one extra bit
    int bps0 = bps, bps1 = bps;
    if (right_side) bps0 = bps + 1;
    else if (left_side || mid_side) bps1 = bps + 1;

    if (!decode_subframe(br, blocksize, bps0, ch0))
      return written > 0 ? written : -1;
    if (channels == 2) {
      if (!decode_subframe(br, blocksize, bps1, ch1))
        return written > 0 ? written : -1;
    }
    br.align_byte();
    br.read_bits(16);  // CRC-16

    for (int i = 0; i < blocksize; i++) {
      float v;
      if (channels == 1) {
        v = (float)ch0[i] * scale;
      } else if (left_side) {
        int64_t l = ch0[i], s = ch1[i];
        v = 0.5f * ((float)l + (float)(l - s)) * scale;
      } else if (right_side) {
        int64_t s = ch0[i], r = ch1[i];
        v = 0.5f * ((float)(r + s) + (float)r) * scale;
      } else if (mid_side) {
        int64_t m = ch0[i], s = ch1[i];
        int64_t mm = (m << 1) | (s & 1);
        v = 0.5f * ((float)((mm + s) >> 1) + (float)((mm - s) >> 1)) * scale;
      } else {
        v = 0.5f * ((float)ch0[i] + (float)ch1[i]) * scale;
      }
      if (out && written < cap) out[written] = v;
      written++;
    }
  }
  return written;
}

// -------------------------------------------------------------- WAV decoding
int64_t decode_wav(const uint8_t* d, size_t n, float* out, int64_t cap, int* sr) {
  if (n < 44 || memcmp(d, "RIFF", 4) != 0 || memcmp(d + 8, "WAVE", 4) != 0)
    return -1;
  size_t off = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_len = 0;
  while (off + 8 <= n) {
    uint32_t len = d[off + 4] | (d[off + 5] << 8) | (d[off + 6] << 16) |
                   ((uint32_t)d[off + 7] << 24);
    if (memcmp(d + off, "fmt ", 4) == 0 && off + 8 + 16 <= n) {
      const uint8_t* p = d + off + 8;
      fmt = p[0] | (p[1] << 8);
      channels = p[2] | (p[3] << 8);
      *sr = (int)(p[4] | (p[5] << 8) | (p[6] << 16) | ((uint32_t)p[7] << 24));
      bits = p[14] | (p[15] << 8);
    } else if (memcmp(d + off, "data", 4) == 0) {
      pcm = d + off + 8;
      pcm_len = len < n - off - 8 ? len : n - off - 8;
    }
    off += 8 + len + (len & 1);
  }
  if (!pcm || channels == 0) return -1;
  size_t bytes_per = bits / 8;
  if (bytes_per == 0) return -1;
  int64_t frames = (int64_t)(pcm_len / (bytes_per * channels));
  if (out == nullptr) return frames;

  for (int64_t i = 0; i < frames && i < cap; i++) {
    float acc = 0.f;
    for (int c = 0; c < channels; c++) {
      const uint8_t* p = pcm + (i * channels + c) * bytes_per;
      float v = 0.f;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float f;
        memcpy(&f, p, 4);
        v = f;
      } else if (bits == 16) {
        int16_t s = (int16_t)(p[0] | (p[1] << 8));
        v = (float)s / 32768.0f;
      } else if (bits == 24) {
        int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)p[2] << 24);
        v = (float)(s >> 8) / 8388608.0f;
      } else if (bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = (float)s / 2147483648.0f;
      }
      acc += v;
    }
    out[i] = acc / (float)channels;
  }
  return frames;
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = fopen(path, "rb");
  if (!f) return buf;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz > 0) {
    buf.resize((size_t)sz);
    if (fread(buf.data(), 1, (size_t)sz, f) != (size_t)sz) buf.clear();
  }
  fclose(f);
  return buf;
}

}  // namespace

extern "C" {

// Decode one file to mono float32. out=NULL queries the sample count.
long long audioio_decode(const char* path, float* out, long long cap, int* sr) {
  std::vector<uint8_t> buf = read_file(path);
  if (buf.empty()) return -1;
  if (buf.size() >= 4 && memcmp(buf.data(), "fLaC", 4) == 0)
    return decode_flac(buf.data(), buf.size(), out, cap, sr);
  return decode_wav(buf.data(), buf.size(), out, cap, sr);
}

// Decode n files in parallel into a padded (n, t_pad) float32 batch.
// lengths[i] receives each file's true sample count (clipped to t_pad).
// Returns 0 on success, -1 if any file failed.
int audioio_load_batch(const char** paths, int n, float* out, long long t_pad,
                       long long* lengths, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next{0};
  std::atomic<int> failed{0};
  auto worker = [&]() {
    int sr = 0;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      float* row = out + (long long)i * t_pad;
      long long got = audioio_decode(paths[i], row, t_pad, &sr);
      if (got < 0) {
        failed.store(1);
        lengths[i] = 0;
        memset(row, 0, sizeof(float) * (size_t)t_pad);
      } else {
        long long m = got < t_pad ? got : t_pad;
        lengths[i] = m;
        if (m < t_pad) memset(row + m, 0, sizeof(float) * (size_t)(t_pad - m));
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failed.load() ? -1 : 0;
}

}  // extern "C"
