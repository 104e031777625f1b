// nativeaudio — first-party host audio runtime for the TPU analyzer.
//
// Replaces the reference's foreign L1 runtimes (libsndfile / audioread /
// soxr behind librosa.load — reference io.py:54; soundfile peak scan —
// loudness.py:60) with self-contained C++:
//
//   * FLAC decoder  (constant / verbatim / fixed / LPC subframes, Rice
//                    partitions, all channel decorrelation modes)
//   * FLAC encoder  (fixed-predictor + Rice; enough to produce the
//                    workflow's artefact files and round-trip tests)
//   * WAV decode/encode (PCM 8/16/24/32, float32/64)
//   * polyphase windowed-sinc resampler (arbitrary rational ratio)
//   * peak scan (dBFS + clipping flag)
//
// Exposed through a minimal C ABI consumed via ctypes (native/__init__.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>
#include <algorithm>

#ifdef NA_HAVE_LIBAV
extern "C" {
#include <libavformat/avformat.h>
#include <libavcodec/avcodec.h>
#include <libavutil/avutil.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
}
#endif

namespace {

// ── bit reader ───────────────────────────────────────────────────────────────
struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool error = false;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte_pos >= size; }

  uint64_t bits(int n) {
    uint64_t v = 0;
    while (n > 0) {
      if (byte_pos >= size) { error = true; return 0; }
      int avail = 8 - bit_pos;
      int take = std::min(avail, n);
      uint8_t cur = data[byte_pos];
      v = (v << take) | ((cur >> (avail - take)) & ((1u << take) - 1));
      bit_pos += take;
      n -= take;
      if (bit_pos == 8) { bit_pos = 0; ++byte_pos; }
    }
    return v;
  }

  int64_t sbits(int n) {
    uint64_t v = bits(n);
    if (n > 0 && (v >> (n - 1)) & 1) return (int64_t)(v | (~0ULL << n));
    return (int64_t)v;
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (!error) {
      if (byte_pos >= size) { error = true; return q; }
      // fast path: whole remaining byte is zeros
      uint8_t cur = data[byte_pos];
      uint8_t rem = (uint8_t)(cur << bit_pos);
      if (rem == 0) { q += 8 - bit_pos; bit_pos = 0; ++byte_pos; continue; }
      // locate highest set bit in the remainder
      int lead = __builtin_clz((unsigned)rem << 24);
      q += lead;
      bit_pos += lead + 1;
      if (bit_pos >= 8) { bit_pos -= 8; ++byte_pos; }
      return q;
    }
    return q;
  }

  void align() { if (bit_pos) { bit_pos = 0; ++byte_pos; } }
};

// ── bit writer ───────────────────────────────────────────────────────────────
struct BitWriter {
  std::vector<uint8_t> out;
  uint64_t acc = 0;   // pending bits, right-aligned; nbits < 8 after flush
  int nbits = 0;

  void bits(uint64_t v, int n) {
    // n <= 56 per call keeps the accumulator overflow-free (callers split)
    acc = (acc << n) | (n >= 64 ? v : (v & ((1ull << n) - 1)));
    nbits += n;
    while (nbits >= 8) {
      nbits -= 8;
      out.push_back((uint8_t)(acc >> nbits));
    }
  }
  void unary(uint32_t q) { while (q >= 32) { bits(0, 32); q -= 32; } bits(1, (int)q + 1); }
  void align() { if (nbits) bits(0, 8 - nbits); }
};

// ── CRCs (FLAC) ──────────────────────────────────────────────────────────────
uint8_t crc8(const uint8_t* d, size_t n) {
  uint8_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= d[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
  }
  return crc;
}

uint16_t crc16(const uint8_t* d, size_t n) {
  uint16_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= (uint16_t)d[i] << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005) : (uint16_t)(crc << 1);
  }
  return crc;
}

// ── FLAC decode ──────────────────────────────────────────────────────────────
struct FlacStreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total_samples = 0;
};

bool read_utf8_number(BitReader& br, uint64_t* out) {
  uint32_t b0 = (uint32_t)br.bits(8);
  if (br.error) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) { *out = b0; return true; }
  else if ((b0 & 0xE0) == 0xC0) { extra = 1; v = b0 & 0x1F; }
  else if ((b0 & 0xF0) == 0xE0) { extra = 2; v = b0 & 0x0F; }
  else if ((b0 & 0xF8) == 0xF0) { extra = 3; v = b0 & 0x07; }
  else if ((b0 & 0xFC) == 0xF8) { extra = 4; v = b0 & 0x03; }
  else if ((b0 & 0xFE) == 0xFC) { extra = 5; v = b0 & 0x01; }
  else if (b0 == 0xFE) { extra = 6; v = 0; }
  else return false;
  for (int i = 0; i < extra; ++i) {
    uint32_t b = (uint32_t)br.bits(8);
    if (br.error || (b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

bool decode_residual(BitReader& br, int blocksize, int pred_order,
                     std::vector<int64_t>& res) {
  uint32_t method = (uint32_t)br.bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = (uint32_t)br.bits(4);
  uint32_t nparts = 1u << porder;
  int part_samples = blocksize >> porder;
  if (part_samples <= 0 || (int)nparts * part_samples != blocksize) return false;
  int idx = pred_order;   // residuals align with sample indices [order, blocksize)
  for (uint32_t p = 0; p < nparts; ++p) {
    int count = part_samples - (p == 0 ? pred_order : 0);
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.bits(plen);
    if (param == escape) {
      uint32_t raw = (uint32_t)br.bits(5);
      for (int i = 0; i < count; ++i) res[idx++] = raw ? br.sbits((int)raw) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.unary();
        uint64_t r = param ? br.bits((int)param) : 0;
        uint64_t u = ((uint64_t)q << param) | r;
        res[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);  // zigzag
      }
    }
    if (br.error) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& out) {
  if (br.bits(1) != 0) return false;  // padding bit
  uint32_t type = (uint32_t)br.bits(6);
  int wasted = 0;
  if (br.bits(1)) { wasted = 1 + (int)br.unary(); }
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;
  out.assign(blocksize, 0);

  if (type == 0) {                         // constant
    int64_t v = br.sbits(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {                  // verbatim
    for (int i = 0; i < blocksize; ++i) out[i] = br.sbits(bps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {   // fixed
    int order = type & 0x07;
    if (order > blocksize) return false;  // warmup must fit the block
    for (int i = 0; i < order; ++i) out[i] = br.sbits(bps);
    std::vector<int64_t> res(blocksize);
    if (!decode_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4: p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4]; break;
      }
      out[i] = p + res[i];
    }
  } else if (type & 0x20) {                // LPC
    int order = (int)(type & 0x1F) + 1;
    if (order > blocksize) return false;  // warmup must fit the block
    for (int i = 0; i < order; ++i) out[i] = br.sbits(bps);
    int prec = (int)br.bits(4) + 1;
    if (prec > 16) return false;
    int shift = (int)br.sbits(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.sbits(prec);
    std::vector<int64_t> res(blocksize);
    if (!decode_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * out[i - 1 - j];
      out[i] = (acc >> shift) + res[i];
    }
  } else {
    return false;
  }
  if (wasted) for (auto& v : out) v <<= wasted;
  return !br.error;
}

int decode_flac(const uint8_t* data, size_t size, std::vector<float>* mono,
                int* sr_out, std::string* err, double* chpeak = nullptr) {
  double pk = 0.0;
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) { *err = "not a FLAC stream"; return 1; }
  size_t pos = 4;
  FlacStreamInfo si;
  bool have_si = false, last = false;
  while (!last) {
    if (pos + 4 > size) { *err = "truncated metadata"; return 1; }
    uint8_t hdr = data[pos];
    last = hdr & 0x80;
    int type = hdr & 0x7F;
    uint32_t len = ((uint32_t)data[pos + 1] << 16) | ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + len > size) { *err = "truncated metadata block"; return 1; }
    if (type == 0 && len >= 34) {
      const uint8_t* p = data + pos;
      si.sample_rate = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) | (p[12] >> 4);
      si.channels = ((p[12] >> 1) & 0x7) + 1;
      si.bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      si.total_samples = ((uint64_t)(p[13] & 0x0F) << 32) | ((uint64_t)p[14] << 24) |
                         ((uint64_t)p[15] << 16) | ((uint64_t)p[16] << 8) | p[17];
      have_si = true;
    }
    pos += len;
  }
  if (!have_si || si.sample_rate == 0) { *err = "missing STREAMINFO"; return 1; }
  *sr_out = (int)si.sample_rate;
  if (si.total_samples) mono->reserve((size_t)si.total_samples);

  static const int bs_table[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                   256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
  double scale_base = 1.0;

  BitReader br(data, size);
  br.byte_pos = pos;

  std::vector<std::vector<int64_t>> ch;
  while (br.byte_pos + 2 < size) {
    // sync
    uint32_t sync = (uint32_t)br.bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) { *err = "lost frame sync"; return mono->empty() ? 1 : 0; }
    br.bits(1);                                  // reserved
    br.bits(1);                                  // blocking strategy
    uint32_t bs_code = (uint32_t)br.bits(4);
    uint32_t sr_code = (uint32_t)br.bits(4);
    uint32_t ch_code = (uint32_t)br.bits(4);
    uint32_t ss_code = (uint32_t)br.bits(3);
    br.bits(1);                                  // reserved
    uint64_t dummy;
    if (!read_utf8_number(br, &dummy)) { *err = "bad frame number"; return 1; }

    int blocksize;
    int t = bs_table[bs_code];
    if (t > 0) blocksize = t;
    else if (t == -1) blocksize = (int)br.bits(8) + 1;
    else if (t == -2) blocksize = (int)br.bits(16) + 1;
    else { *err = "reserved blocksize code"; return 1; }

    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);

    int bps = si.bps;
    switch (ss_code) {
      case 0: break; case 1: bps = 8; break; case 2: bps = 12; break;
      case 4: bps = 16; break; case 5: bps = 20; break; case 6: bps = 24; break;
      case 7: bps = 32; break; default: *err = "bad sample size"; return 1;
    }
    scale_base = std::pow(2.0, bps - 1);

    br.bits(8);                                  // CRC-8 (not verified)

    int nch;
    int mode = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
    if (ch_code < 8) { nch = (int)ch_code + 1; }
    else if (ch_code == 8) { nch = 2; mode = 1; }
    else if (ch_code == 9) { nch = 2; mode = 2; }
    else if (ch_code == 10) { nch = 2; mode = 3; }
    else { *err = "bad channel assignment"; return 1; }

    ch.assign(nch, {});
    for (int c = 0; c < nch; ++c) {
      int cbps = bps;
      if ((mode == 1 && c == 1) || (mode == 2 && c == 0) || (mode == 3 && c == 1))
        cbps += 1;                               // side channel
      if (!decode_subframe(br, blocksize, cbps, ch[c])) {
        *err = "subframe decode failed"; return mono->empty() ? 1 : 0;
      }
    }
    br.align();
    br.bits(16);                                 // CRC-16 (not verified)
    if (br.error) break;

    // channel decorrelation + mono mixdown (per-channel peak pre-mixdown:
    // |mean(L,R)| <= max(|L|,|R|), so clipping detection must see channels)
    double inv = 1.0 / scale_base;
    for (int i = 0; i < blocksize; ++i) {
      double l, r, m;
      switch (mode) {
        case 1: l = (double)ch[0][i]; r = (double)(ch[0][i] - ch[1][i]);
                m = 0.5 * (l + r);
                pk = std::max(pk, std::max(std::fabs(l), std::fabs(r)) * inv); break;
        case 2: r = (double)ch[1][i]; l = (double)(ch[1][i] + ch[0][i]);
                m = 0.5 * (l + r);
                pk = std::max(pk, std::max(std::fabs(l), std::fabs(r)) * inv); break;
        case 3: { int64_t side = ch[1][i];
                  int64_t mid2 = (ch[0][i] << 1) | (side & 1);
                  l = (double)((mid2 + side) >> 1);
                  r = (double)((mid2 - side) >> 1);
                  m = 0.5 * (l + r);
                  pk = std::max(pk, std::max(std::fabs(l), std::fabs(r)) * inv); } break;
        default: { double acc = 0;
                   for (int c = 0; c < nch; ++c) {
                     acc += (double)ch[c][i];
                     pk = std::max(pk, std::fabs((double)ch[c][i]) * inv);
                   }
                   m = acc / nch; } break;
      }
      mono->push_back((float)(m * inv));
    }
  }
  if (chpeak) *chpeak = pk;
  return 0;
}

// ── FLAC encode (mono/stereo int16, fixed predictors) ────────────────────────
int best_rice_param(const int64_t* res, int n) {
  if (n == 0) return 0;
  uint64_t sum = 0;
  for (int i = 0; i < n; ++i) sum += (uint64_t)((res[i] << 1) ^ (res[i] >> 63));
  double mean = (double)sum / n;
  int k = 0;
  while ((1ull << (k + 1)) < mean + 1 && k < 14) ++k;
  return k;
}

void write_rice(BitWriter& bw, const int64_t* res, int n, int k) {
  for (int i = 0; i < n; ++i) {
    uint64_t u = (uint64_t)((res[i] << 1) ^ (res[i] >> 63));
    bw.unary((uint32_t)(u >> k));
    if (k) bw.bits(u & ((1ull << k) - 1), k);
  }
}

// Exact Rice size in bits at the best parameter for this residual block.
uint64_t rice_cost(const int64_t* res, int n, int* k_out) {
  int k = best_rice_param(res, n);
  uint64_t bits = 0;
  for (int i = 0; i < n; ++i) {
    uint64_t u = (uint64_t)((res[i] << 1) ^ (res[i] >> 63));
    bits += (u >> k) + 1 + (uint64_t)k;
  }
  *k_out = k;
  return bits;
}

// Levinson-Durbin LPC fit + libFLAC-style coefficient quantization.
// Returns false when the block is degenerate (silence / too short).
bool compute_qlpc(const int64_t* s, int n, int order, int prec,
                  std::vector<int64_t>* qcoef, int* shift_out) {
  if (n <= order * 2) return false;
  std::vector<double> ac(order + 1, 0.0);
  for (int lag = 0; lag <= order; ++lag) {
    double acc = 0;
    for (int i = lag; i < n; ++i) acc += (double)s[i] * (double)s[i - lag];
    ac[lag] = acc;
  }
  if (!(ac[0] > 0)) return false;
  std::vector<double> a(order, 0.0);
  double err = ac[0];
  for (int i = 0; i < order; ++i) {
    double r = ac[i + 1];
    for (int j = 0; j < i; ++j) r -= a[j] * ac[i - j];
    if (!(err > 0)) return false;
    double k = r / err;
    a[i] = k;
    for (int j = 0; j < i / 2; ++j) {
      double t = a[j];
      a[j] = t - k * a[i - 1 - j];
      a[i - 1 - j] -= k * t;
    }
    if (i & 1) a[i / 2] -= k * a[i / 2];
    err *= (1.0 - k * k);
  }
  double cmax = 0;
  for (int j = 0; j < order; ++j) cmax = std::max(cmax, std::fabs(a[j]));
  if (!(cmax > 0)) return false;
  int headroom = (int)std::floor(std::log2(cmax)) + 1;
  int shift = prec - 1 - headroom;
  shift = std::max(0, std::min(15, shift));
  qcoef->assign(order, 0);
  int64_t qmax = (1ll << (prec - 1)) - 1, qmin = -(1ll << (prec - 1));
  double e = 0;
  for (int j = 0; j < order; ++j) {
    double v = a[j] * (double)(1ll << shift) + e;
    int64_t q = (int64_t)std::llround(v);
    q = std::max(qmin, std::min(qmax, q));
    e = v - (double)q;
    (*qcoef)[j] = q;
  }
  *shift_out = shift;
  return true;
}

int encode_flac(const char* path, const float* x, long n, int sr, std::string* err) {
  const int BS = 4096;
  const int BPS = 16;
  FILE* f = fopen(path, "wb");
  if (!f) { *err = "cannot open output"; return 1; }
  fwrite("fLaC", 1, 4, f);

  // STREAMINFO (last metadata block)
  uint8_t si[38] = {0};
  si[0] = 0x80; si[3] = 34;
  uint8_t* p = si + 4;
  p[0] = BS >> 8; p[1] = BS & 0xFF; p[2] = BS >> 8; p[3] = BS & 0xFF;
  // min/max frame size unknown (0)
  p[10] = (uint8_t)(sr >> 12); p[11] = (uint8_t)(sr >> 4);
  p[12] = (uint8_t)(((sr & 0xF) << 4) | ((1 - 1) << 1) | (((BPS - 1) >> 4) & 1));
  p[13] = (uint8_t)((((BPS - 1) & 0xF) << 4) | ((((uint64_t)n) >> 32) & 0xF));
  p[14] = (uint8_t)((uint64_t)n >> 24); p[15] = (uint8_t)((uint64_t)n >> 16);
  p[16] = (uint8_t)((uint64_t)n >> 8); p[17] = (uint8_t)n;
  fwrite(si, 1, 38, f);

  std::vector<int64_t> s(BS), res(BS);
  long frame_no = 0;
  for (long start = 0; start < n; start += BS, ++frame_no) {
    int bs = (int)std::min((long)BS, n - start);
    for (int i = 0; i < bs; ++i) {
      double v = x[start + i] * 32768.0;
      s[i] = (int64_t)std::lround(std::max(-32768.0, std::min(32767.0, v)));
    }

    BitWriter bw;
    bw.bits(0x3FFE, 14);
    bw.bits(0, 1); bw.bits(0, 1);                 // reserved, fixed blocksize
    int bs_code = (bs == BS) ? 12 : 7;            // 4096 | 16-bit explicit
    bw.bits(bs_code, 4);
    bw.bits(0, 4);                                // sample rate: from STREAMINFO
    bw.bits(0, 4);                                // 1 channel
    bw.bits(4, 3);                                // 16 bps
    bw.bits(0, 1);
    // UTF-8 frame number
    {
      uint64_t v = (uint64_t)frame_no;
      if (v < 0x80) bw.bits(v, 8);
      else if (v < 0x800) { bw.bits(0xC0 | (v >> 6), 8); bw.bits(0x80 | (v & 0x3F), 8); }
      else if (v < 0x10000) { bw.bits(0xE0 | (v >> 12), 8); bw.bits(0x80 | ((v >> 6) & 0x3F), 8); bw.bits(0x80 | (v & 0x3F), 8); }
      else { bw.bits(0xF0 | (v >> 18), 8); bw.bits(0x80 | ((v >> 12) & 0x3F), 8); bw.bits(0x80 | ((v >> 6) & 0x3F), 8); bw.bits(0x80 | (v & 0x3F), 8); }
    }
    if (bs_code == 7) bw.bits((uint64_t)(bs - 1), 16);
    bw.align();
    uint8_t hcrc = crc8(bw.out.data(), bw.out.size());
    bw.bits(hcrc, 8);

    // Candidate subframes by exact Rice cost: fixed orders 0..2 and an
    // order-8 quantized-LPC fit (libFLAC-class compression for tonal
    // material; the round-1 encoder was fixed-predictor only).
    const int LPC_ORDER = 8, LPC_PREC = 15;
    int best_order = 0, best_k = 0;
    bool best_is_lpc = false;
    uint64_t best_cost = ~0ull;
    std::vector<int64_t> lpc_coef;
    int lpc_shift = 0;
    for (int order = 0; order <= 2 && order < bs; ++order) {
      for (int i = order; i < bs; ++i) {
        if (order == 0) res[i] = s[i];
        else if (order == 1) res[i] = s[i] - s[i - 1];
        else res[i] = s[i] - 2 * s[i - 1] + s[i - 2];
      }
      int k;
      uint64_t cost = rice_cost(res.data() + order, bs - order, &k) +
                      (uint64_t)order * BPS;
      if (cost < best_cost) {
        best_cost = cost; best_order = order; best_k = k; best_is_lpc = false;
      }
    }
    std::vector<int64_t> qc;
    int shift;
    if (bs > LPC_ORDER * 2 &&
        compute_qlpc(s.data(), bs, LPC_ORDER, LPC_PREC, &qc, &shift)) {
      for (int i = LPC_ORDER; i < bs; ++i) {
        int64_t acc = 0;
        for (int j = 0; j < LPC_ORDER; ++j) acc += qc[j] * s[i - 1 - j];
        res[i] = s[i] - (acc >> shift);
      }
      int k;
      uint64_t cost = rice_cost(res.data() + LPC_ORDER, bs - LPC_ORDER, &k) +
                      (uint64_t)LPC_ORDER * (BPS + LPC_PREC) + 9;
      if (cost < best_cost) {
        best_cost = cost; best_order = LPC_ORDER; best_k = k;
        best_is_lpc = true; lpc_coef = qc; lpc_shift = shift;
      }
    }
    int order = best_order;
    for (int i = 0; i < bs; ++i) {
      if (i < order) res[i] = 0;
      else if (best_is_lpc) {
        int64_t acc = 0;
        for (int j = 0; j < order; ++j) acc += lpc_coef[j] * s[i - 1 - j];
        res[i] = s[i] - (acc >> lpc_shift);
      }
      else if (order == 0) res[i] = s[i];
      else if (order == 1) res[i] = s[i] - s[i - 1];
      else res[i] = s[i] - 2 * s[i - 1] + s[i - 2];
    }

    bw.bits(0, 1);
    if (best_is_lpc) bw.bits(0x20 | (order - 1), 6);  // LPC subframe
    else bw.bits(0x08 | order, 6);                    // fixed subframe
    bw.bits(0, 1);                                    // no wasted bits
    for (int i = 0; i < order; ++i) bw.bits((uint64_t)(s[i] & 0xFFFF), 16);
    if (best_is_lpc) {
      bw.bits((uint64_t)(LPC_PREC - 1), 4);
      bw.bits((uint64_t)lpc_shift & 0x1F, 5);
      for (int j = 0; j < order; ++j)
        bw.bits((uint64_t)lpc_coef[j] & ((1ull << LPC_PREC) - 1), LPC_PREC);
    }
    bw.bits(0, 2);                                // rice method 0
    bw.bits(0, 4);                                // partition order 0
    int k = best_k;
    bw.bits((uint64_t)k, 4);
    write_rice(bw, res.data() + order, bs - order, k);
    bw.align();
    uint16_t fcrc = crc16(bw.out.data(), bw.out.size());
    bw.bits(fcrc >> 8, 8); bw.bits(fcrc & 0xFF, 8);

    fwrite(bw.out.data(), 1, bw.out.size(), f);
  }
  fclose(f);
  return 0;
}

// ── WAV ──────────────────────────────────────────────────────────────────────
uint32_t rd32(const uint8_t* p) { return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24); }
uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }

int decode_wav(const uint8_t* d, size_t n, std::vector<float>* mono,
               int* sr_out, std::string* err, double* chpeak = nullptr) {
  if (n < 44 || memcmp(d, "RIFF", 4) || memcmp(d + 8, "WAVE", 4)) {
    *err = "not a WAV file"; return 1;
  }
  size_t pos = 12;
  int fmt = 0, channels = 0, bits = 0; uint32_t sr = 0;
  const uint8_t* data = nullptr; size_t data_len = 0;
  while (pos + 8 <= n) {
    uint32_t len = rd32(d + pos + 4);
    if (!memcmp(d + pos, "fmt ", 4) && pos + 8 + 16 <= n) {
      fmt = rd16(d + pos + 8);
      channels = rd16(d + pos + 10);
      sr = rd32(d + pos + 12);
      bits = rd16(d + pos + 22);
      if (fmt == 0xFFFE && len >= 40) fmt = rd16(d + pos + 8 + 24);  // extensible
    } else if (!memcmp(d + pos, "data", 4)) {
      data = d + pos + 8;
      data_len = std::min((size_t)len, n - pos - 8);
    }
    pos += 8 + len + (len & 1);
  }
  if (!data || !channels || !sr) { *err = "missing fmt/data chunk"; return 1; }
  // Validate the fmt chunk before any arithmetic: a crafted file declaring
  // bits=0 would otherwise divide by zero below (advisor finding, round 1).
  if (fmt != 1 && fmt != 3) { *err = "unsupported WAV format tag"; return 1; }
  if (bits != 8 && bits != 16 && bits != 24 && bits != 32 && bits != 64) {
    *err = "unsupported WAV bit depth"; return 1;
  }
  if (channels <= 0 || channels > 64) { *err = "bad WAV channel count"; return 1; }
  if (fmt == 3 && bits != 32 && bits != 64) { *err = "bad float WAV depth"; return 1; }
  *sr_out = (int)sr;
  int bytes = bits / 8;
  size_t frames = data_len / ((size_t)bytes * channels);
  mono->resize(frames);
  double pk = 0.0;
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = data + (i * channels + c) * bytes;
      double v = 0;
      if (fmt == 3 && bits == 32) { float fv; memcpy(&fv, s, 4); v = fv; }
      else if (fmt == 3 && bits == 64) { double dv; memcpy(&dv, s, 8); v = dv; }
      else if (bits == 8) { v = ((int)s[0] - 128) / 128.0; }
      else if (bits == 16) { v = (int16_t)rd16(s) / 32768.0; }
      else if (bits == 24) {
        int32_t iv = s[0] | (s[1] << 8) | (s[2] << 16);
        if (iv & 0x800000) iv |= ~0xFFFFFF;
        v = iv / 8388608.0;
      } else if (bits == 32) { v = (int32_t)rd32(s) / 2147483648.0; }
      acc += v;
      pk = std::max(pk, std::fabs(v));
    }
    (*mono)[i] = (float)(acc / channels);
  }
  if (chpeak) *chpeak = pk;
  return 0;
}

int encode_wav(const char* path, const float* x, long n, int sr, int bits,
               std::string* err) {
  if (bits != 16 && bits != 24 && bits != 32) { *err = "bits must be 16/24/32"; return 1; }
  FILE* f = fopen(path, "wb");
  if (!f) { *err = "cannot open output"; return 1; }
  int bytes = bits / 8;
  uint32_t data_len = (uint32_t)(n * bytes);
  uint8_t hdr[44];
  memcpy(hdr, "RIFF", 4);
  uint32_t riff = 36 + data_len; memcpy(hdr + 4, &riff, 4);
  memcpy(hdr + 8, "WAVEfmt ", 8);
  uint32_t fmtlen = 16; memcpy(hdr + 16, &fmtlen, 4);
  uint16_t fmt = 1, ch = 1; memcpy(hdr + 20, &fmt, 2); memcpy(hdr + 22, &ch, 2);
  uint32_t sru = (uint32_t)sr; memcpy(hdr + 24, &sru, 4);
  uint32_t brate = sru * bytes; memcpy(hdr + 28, &brate, 4);
  uint16_t align = (uint16_t)bytes, bb = (uint16_t)bits;
  memcpy(hdr + 32, &align, 2); memcpy(hdr + 34, &bb, 2);
  memcpy(hdr + 36, "data", 4); memcpy(hdr + 40, &data_len, 4);
  fwrite(hdr, 1, 44, f);
  std::vector<uint8_t> buf((size_t)n * bytes);
  double scale = std::pow(2.0, bits - 1);
  for (long i = 0; i < n; ++i) {
    double v = std::max(-1.0, std::min(32767.0 / 32768.0, (double)x[i]));
    int64_t iv = (int64_t)std::lround(v * scale);
    iv = std::max((int64_t)(-(1ll << (bits - 1))),
                  std::min((int64_t)((1ll << (bits - 1)) - 1), iv));
    for (int b = 0; b < bytes; ++b) buf[(size_t)i * bytes + b] = (uint8_t)(iv >> (8 * b));
  }
  fwrite(buf.data(), 1, buf.size(), f);
  fclose(f);
  return 0;
}

// ── polyphase windowed-sinc resampler ────────────────────────────────────────
double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

long gcd_l(long a, long b) { while (b) { long t = a % b; a = b; b = t; } return a; }

int resample(const float* in, long n_in, int sr_in, int sr_out,
             std::vector<float>* out) {
  if (sr_in == sr_out) { out->assign(in, in + n_in); return 0; }
  long g = gcd_l(sr_in, sr_out);
  long L = sr_out / g, M = sr_in / g;
  const int HALF = 64;                 // taps per side (per output sample)
  const int TAPS = 2 * HALF;
  double cutoff = 0.97 * std::min(1.0, (double)L / (double)M);
  const double beta = 12.0;
  double i0b = bessel_i0(beta);
  long n_out = (long)(((__int128)n_in * L + M - 1) / M);
  out->resize(n_out);

  // Polyphase: the fractional offset of output sample j is (j*M mod L)/L,
  // so only L distinct filter phases exist — precompute them all.
  long n_phases = std::min(L, (long)65536);
  bool exact_phases = (L == n_phases);
  std::vector<float> table((size_t)n_phases * TAPS);
  for (long p = 0; p < n_phases; ++p) {
    double frac = (double)p / (double)n_phases;
    double sum = 0;
    for (int k = 0; k < TAPS; ++k) {
      double dt = (double)(k - HALF + 1) - frac;
      double x = dt / HALF;
      double w = (x > -1.0 && x < 1.0)
                     ? bessel_i0(beta * std::sqrt(1.0 - x * x)) / i0b : 0.0;
      double s = (dt == 0.0) ? cutoff : std::sin(M_PI * cutoff * dt) / (M_PI * dt);
      table[(size_t)p * TAPS + k] = (float)(w * s);
      sum += w * s;
    }
    double inv = sum > 0 ? 1.0 / sum : 1.0;
    for (int k = 0; k < TAPS; ++k) table[(size_t)p * TAPS + k] *= (float)inv;
  }

  for (long j = 0; j < n_out; ++j) {
    long num = j * M;                     // input-time position = num / L
    long n0 = num / L;
    long p = exact_phases ? (num % L)
                          : (long)(((double)(num % L) / L) * n_phases);
    const float* h = &table[(size_t)p * TAPS];
    long lo = n0 - HALF + 1;
    double acc = 0;
    if (lo >= 0 && lo + TAPS <= n_in) {
      const float* s = in + lo;
      for (int k = 0; k < TAPS; ++k) acc += (double)h[k] * s[k];
    } else {
      for (int k = 0; k < TAPS; ++k) {
        long idx = lo + k;
        if (idx >= 0 && idx < n_in) acc += (double)h[k] * in[idx];
      }
    }
    (*out)[j] = (float)acc;
  }
  return 0;
}

// ── lossy-format decode via the system libav* (MP3 / AAC / OGG / M4A…) ──────
//
// The reference gets lossy decode from the same place: librosa.load →
// audioread → ffmpeg (reference io.py:54, requirements.txt:24). FLAC/WAV
// stay first-party above (faster, dependency-free); everything else routes
// through libavformat/libavcodec when the toolchain found them at build
// time (NA_HAVE_LIBAV), mirroring the reference's fallback architecture.
#ifdef NA_HAVE_LIBAV

double av_sample_as_double(const uint8_t* base, int fmt_packed, size_t idx) {
  switch (fmt_packed) {
    case AV_SAMPLE_FMT_U8:  return ((int)base[idx] - 128) / 128.0;
    case AV_SAMPLE_FMT_S16: { int16_t v; memcpy(&v, base + 2 * idx, 2); return v / 32768.0; }
    case AV_SAMPLE_FMT_S32: { int32_t v; memcpy(&v, base + 4 * idx, 4); return v / 2147483648.0; }
    case AV_SAMPLE_FMT_S64: { int64_t v; memcpy(&v, base + 8 * idx, 8); return (double)v / 9223372036854775808.0; }
    case AV_SAMPLE_FMT_FLT: { float v; memcpy(&v, base + 4 * idx, 4); return v; }
    case AV_SAMPLE_FMT_DBL: { double v; memcpy(&v, base + 8 * idx, 8); return v; }
    default: return 0.0;
  }
}

int decode_libav(const char* path, std::vector<float>* mono, int* sr_out,
                 std::string* err, double* chpeak) {
  av_log_set_level(AV_LOG_ERROR);
  AVFormatContext* fc = nullptr;
  if (avformat_open_input(&fc, path, nullptr, nullptr) < 0) {
    *err = "unsupported or unreadable container"; return 1;
  }
  struct Guard {
    AVFormatContext** fc; AVCodecContext** cc; AVFrame** fr; AVPacket** pk;
    ~Guard() {
      if (pk && *pk) av_packet_free(pk);
      if (fr && *fr) av_frame_free(fr);
      if (cc && *cc) avcodec_free_context(cc);
      if (fc && *fc) avformat_close_input(fc);
    }
  };
  AVCodecContext* cc = nullptr;
  AVFrame* fr = nullptr;
  AVPacket* pk = nullptr;
  Guard g{&fc, &cc, &fr, &pk};

  if (avformat_find_stream_info(fc, nullptr) < 0) {
    *err = "no stream info"; return 1;
  }
  const AVCodec* dec = nullptr;
  int si = av_find_best_stream(fc, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
  if (si < 0 || !dec) { *err = "no audio stream"; return 1; }
  cc = avcodec_alloc_context3(dec);
  if (!cc || avcodec_parameters_to_context(cc, fc->streams[si]->codecpar) < 0 ||
      avcodec_open2(cc, dec, nullptr) < 0) {
    *err = "decoder open failed"; return 1;
  }
  fr = av_frame_alloc();
  pk = av_packet_alloc();
  double pkv = 0.0;
  int sr = 0;

  auto drain = [&](void) -> bool {
    while (true) {
      int rc = avcodec_receive_frame(cc, fr);
      if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return true;
      if (rc < 0) return false;
      int nch = fr->ch_layout.nb_channels;
      if (nch <= 0) nch = 1;
      if (!sr) sr = fr->sample_rate ? fr->sample_rate : cc->sample_rate;
      int fmt = fr->format;
      bool planar = av_sample_fmt_is_planar((AVSampleFormat)fmt) != 0;
      int base_fmt = planar ? av_get_packed_sample_fmt((AVSampleFormat)fmt) : fmt;
      for (int i = 0; i < fr->nb_samples; ++i) {
        double acc = 0;
        for (int c = 0; c < nch; ++c) {
          double v = planar
              ? av_sample_as_double(fr->extended_data[c], base_fmt, (size_t)i)
              : av_sample_as_double(fr->extended_data[0], base_fmt,
                                    (size_t)i * nch + c);
          acc += v;
          pkv = std::max(pkv, std::fabs(v));
        }
        mono->push_back((float)(acc / nch));
      }
      av_frame_unref(fr);
    }
  };

  while (av_read_frame(fc, pk) >= 0) {
    if (pk->stream_index == si) {
      if (avcodec_send_packet(cc, pk) == 0) {
        if (!drain()) { *err = "decode error"; return 1; }
      }
    }
    av_packet_unref(pk);
  }
  avcodec_send_packet(cc, nullptr);  // flush
  drain();

  if (mono->empty() || !sr) { *err = "no decodable audio"; return 1; }
  *sr_out = sr;
  if (chpeak) *chpeak = pkv;
  return 0;
}

// Generic lossy encode (test vectors + artefact parity): mono float32 →
// MP3 / OGG-Vorbis / M4A-AAC, container guessed from the file extension.
int encode_libav(const char* path, const float* x, long n, int sr,
                 const char* codec_name, int bitrate, std::string* err) {
  av_log_set_level(AV_LOG_ERROR);
  AVFormatContext* oc = nullptr;
  if (avformat_alloc_output_context2(&oc, nullptr, nullptr, path) < 0 || !oc) {
    *err = "cannot infer output container from extension"; return 1;
  }
  const AVCodec* enc = (codec_name && codec_name[0])
      ? avcodec_find_encoder_by_name(codec_name)
      : avcodec_find_encoder(oc->oformat->audio_codec);
  if (!enc) { avformat_free_context(oc); *err = "encoder unavailable"; return 1; }
  AVCodecContext* cc = avcodec_alloc_context3(enc);
  AVStream* st = avformat_new_stream(oc, nullptr);
  if (!cc || !st) {
    if (cc) avcodec_free_context(&cc);
    avformat_free_context(oc); *err = "alloc failed"; return 1;
  }
  cc->sample_rate = sr;
  av_channel_layout_default(&cc->ch_layout, 1);
  cc->sample_fmt = enc->sample_fmts ? enc->sample_fmts[0] : AV_SAMPLE_FMT_FLTP;
  cc->bit_rate = bitrate > 0 ? bitrate : 160000;
  cc->time_base = AVRational{1, sr};
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  cc->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;  // native aac/vorbis
  if (avcodec_open2(cc, enc, nullptr) < 0) {
    avcodec_free_context(&cc); avformat_free_context(oc);
    *err = "encoder open failed"; return 1;
  }
  avcodec_parameters_from_context(st->codecpar, cc);
  st->time_base = cc->time_base;
  if (!(oc->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) {
    avcodec_free_context(&cc); avformat_free_context(oc);
    *err = "cannot open output file"; return 1;
  }
  if (avformat_write_header(oc, nullptr) < 0) {
    avcodec_free_context(&cc); avformat_free_context(oc);
    *err = "cannot write container header"; return 1;
  }

  AVFrame* fr = av_frame_alloc();
  AVPacket* pk = av_packet_alloc();
  int frame_len = cc->frame_size > 0 ? cc->frame_size : 4096;
  long pos = 0;
  int64_t pts = 0;
  int rc_all = 0;

  auto pump = [&](AVFrame* f) -> int {
    if (avcodec_send_frame(cc, f) < 0) return 1;
    while (true) {
      int rc = avcodec_receive_packet(cc, pk);
      if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
      if (rc < 0) return 1;
      av_packet_rescale_ts(pk, cc->time_base, st->time_base);
      pk->stream_index = st->index;
      if (av_interleaved_write_frame(oc, pk) < 0) return 1;
    }
  };

  while (pos < n && rc_all == 0) {
    int len = (int)std::min((long)frame_len, n - pos);
    fr->nb_samples = len;
    fr->format = cc->sample_fmt;
    av_channel_layout_copy(&fr->ch_layout, &cc->ch_layout);
    if (av_frame_get_buffer(fr, 0) < 0) { rc_all = 1; break; }
    // mono: planar and packed layouts coincide
    switch (av_get_packed_sample_fmt(cc->sample_fmt)) {
      case AV_SAMPLE_FMT_FLT:
        memcpy(fr->extended_data[0], x + pos, (size_t)len * 4); break;
      case AV_SAMPLE_FMT_DBL: {
        double* d = (double*)fr->extended_data[0];
        for (int i = 0; i < len; ++i) d[i] = x[pos + i];
      } break;
      case AV_SAMPLE_FMT_S16: {
        int16_t* d = (int16_t*)fr->extended_data[0];
        for (int i = 0; i < len; ++i) {
          double v = std::max(-1.0, std::min(32767.0 / 32768.0, (double)x[pos + i]));
          d[i] = (int16_t)std::lround(v * 32768.0);
        }
      } break;
      case AV_SAMPLE_FMT_S32: {
        int32_t* d = (int32_t*)fr->extended_data[0];
        for (int i = 0; i < len; ++i) {
          double v = std::max(-1.0, std::min(1.0, (double)x[pos + i]));
          d[i] = (int32_t)std::llround(v * 2147483647.0);
        }
      } break;
      default: rc_all = 1; break;
    }
    fr->pts = pts;
    pts += len;
    pos += len;
    if (rc_all == 0) rc_all = pump(fr);
    av_frame_unref(fr);
  }
  if (rc_all == 0) rc_all = pump(nullptr);  // flush
  if (rc_all == 0 && av_write_trailer(oc) < 0) rc_all = 1;

  av_packet_free(&pk);
  av_frame_free(&fr);
  avcodec_free_context(&cc);
  if (!(oc->oformat->flags & AVFMT_NOFILE) && oc->pb) avio_closep(&oc->pb);
  avformat_free_context(oc);
  if (rc_all) { *err = "lossy encode failed"; return 1; }
  return 0;
}

#else  // !NA_HAVE_LIBAV

int decode_libav(const char* path, std::vector<float>* mono, int* sr_out,
                 std::string* err, double* chpeak) {
  (void)path; (void)mono; (void)sr_out; (void)chpeak;
  *err = "unsupported container (this build decodes FLAC and WAV only; "
         "lossy formats need the libav* system libraries at build time)";
  return 1;
}

int encode_libav(const char* path, const float* x, long n, int sr,
                 const char* codec_name, int bitrate, std::string* err) {
  (void)path; (void)x; (void)n; (void)sr; (void)codec_name; (void)bitrate;
  *err = "lossy encode unavailable (built without libav*)";
  return 1;
}

#endif  // NA_HAVE_LIBAV

thread_local std::string g_err;

}  // namespace

// ── C ABI ────────────────────────────────────────────────────────────────────
extern "C" {

int na_version() { return 12; }

const char* na_last_error() { return g_err.c_str(); }

void na_free(float* p) { free(p); }

static int to_heap(const std::vector<float>& v, float** out, long* n_out) {
  *out = (float*)malloc(v.size() * sizeof(float));
  if (!*out) { g_err = "oom"; return 1; }
  memcpy(*out, v.data(), v.size() * sizeof(float));
  *n_out = (long)v.size();
  return 0;
}

// Decode any supported container to mono float32 at native rate.
// peak_out (nullable): pre-mixdown per-channel absolute peak in [0, ..),
// for clipping detection (reference loudness.py:40-65 reads channels via
// soundfile always_2d and maxes over all of them).
int na_decode_peak(const char* path, float** out, long* n_out, int* sr_out,
                   double* peak_out) {
  FILE* f = fopen(path, "rb");
  if (!f) { g_err = "cannot open file"; return 1; }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data((size_t)size);
  if (fread(data.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f); g_err = "read failed"; return 1;
  }
  fclose(f);
  std::vector<float> mono;
  int rc;
  if (size >= 4 && !memcmp(data.data(), "fLaC", 4))
    rc = decode_flac(data.data(), data.size(), &mono, sr_out, &g_err, peak_out);
  else if (size >= 4 && !memcmp(data.data(), "RIFF", 4))
    rc = decode_wav(data.data(), data.size(), &mono, sr_out, &g_err, peak_out);
  else
    rc = decode_libav(path, &mono, sr_out, &g_err, peak_out);
  if (rc) return rc;
  return to_heap(mono, out, n_out);
}

int na_decode(const char* path, float** out, long* n_out, int* sr_out) {
  return na_decode_peak(path, out, n_out, sr_out, nullptr);
}

int na_resample(const float* in, long n_in, int sr_in, int sr_out,
                float** out, long* n_out) {
  std::vector<float> v;
  if (resample(in, n_in, sr_in, sr_out, &v)) { g_err = "resample failed"; return 1; }
  return to_heap(v, out, n_out);
}

int na_decode_resampled(const char* path, int target_sr,
                        float** out, long* n_out, int* native_sr) {
  float* raw = nullptr; long n_raw = 0;
  int rc = na_decode(path, &raw, &n_raw, native_sr);
  if (rc) return rc;
  if (*native_sr == target_sr) { *out = raw; *n_out = n_raw; return 0; }
  std::vector<float> v;
  resample(raw, n_raw, *native_sr, target_sr, &v);
  free(raw);
  return to_heap(v, out, n_out);
}

int na_encode_wav(const char* path, const float* x, long n, int sr, int bits) {
  return encode_wav(path, x, n, sr, bits, &g_err);
}

int na_encode_flac(const char* path, const float* x, long n, int sr) {
  return encode_flac(path, x, n, sr, &g_err);
}

// 1 when lossy decode/encode (MP3/AAC/OGG/M4A via libav*) is compiled in.
int na_has_libav() {
#ifdef NA_HAVE_LIBAV
  return 1;
#else
  return 0;
#endif
}

int na_encode_lossy(const char* path, const float* x, long n, int sr,
                    const char* codec, int bitrate) {
  return encode_libav(path, x, n, sr, codec, bitrate, &g_err);
}

// Header-only duration probe (seconds; < 0 on error).  Lets the corpus
// driver bucket a manifest by duration WITHOUT decoding anything — the
// round-1 driver decoded the whole manifest into RAM up front, which
// cannot reach the 1000-pair target.  FLAC: STREAMINFO total_samples;
// WAV: data-chunk length; anything else: libav container metadata.
double na_probe_duration(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { g_err = "cannot open file"; return -1.0; }
  uint8_t head[64];
  size_t got = fread(head, 1, sizeof head, f);
  if (got >= 42 && !memcmp(head, "fLaC", 4)) {
    // STREAMINFO is the first metadata block per spec
    const uint8_t* p = head + 8;
    uint32_t sr = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) | (p[12] >> 4);
    uint64_t total = ((uint64_t)(p[13] & 0x0F) << 32) | ((uint64_t)p[14] << 24) |
                     ((uint64_t)p[15] << 16) | ((uint64_t)p[16] << 8) | p[17];
    fclose(f);
    if (sr == 0) { g_err = "bad FLAC header"; return -1.0; }
    if (total == 0) { g_err = "FLAC total_samples unknown"; return -1.0; }
    return (double)total / sr;
  }
  if (got >= 44 && !memcmp(head, "RIFF", 4) && !memcmp(head + 8, "WAVE", 4)) {
    // walk chunks for fmt + data sizes
    uint32_t sr = 0; int channels = 0, bits = 0; uint64_t data_len = 0;
    long pos = 12;
    uint8_t ch[8];
    fseek(f, pos, SEEK_SET);
    while (fread(ch, 1, 8, f) == 8) {
      uint32_t len = rd32(ch + 4);
      if (!memcmp(ch, "fmt ", 4)) {
        uint8_t fmt[16];
        if (fread(fmt, 1, 16, f) != 16) break;
        channels = rd16(fmt + 2);
        sr = rd32(fmt + 4);
        bits = rd16(fmt + 14);
        fseek(f, (long)len - 16 + (len & 1), SEEK_CUR);
      } else if (!memcmp(ch, "data", 4)) {
        data_len = len;
        fseek(f, (long)len + (len & 1), SEEK_CUR);
      } else {
        fseek(f, (long)len + (len & 1), SEEK_CUR);
      }
    }
    fclose(f);
    int bytes = bits / 8;
    if (!sr || !channels || !bytes) { g_err = "bad WAV header"; return -1.0; }
    return (double)(data_len / ((uint64_t)bytes * channels)) / sr;
  }
  fclose(f);
#ifdef NA_HAVE_LIBAV
  av_log_set_level(AV_LOG_ERROR);
  AVFormatContext* fc = nullptr;
  if (avformat_open_input(&fc, path, nullptr, nullptr) < 0) {
    g_err = "unsupported container"; return -1.0;
  }
  double dur = -1.0;
  if (avformat_find_stream_info(fc, nullptr) >= 0 && fc->duration > 0)
    dur = (double)fc->duration / AV_TIME_BASE;
  avformat_close_input(&fc);
  if (dur < 0) g_err = "container reports no duration";
  return dur;
#else
  g_err = "unsupported container (built without libav*)";
  return -1.0;
#endif
}

// Conformance oracle: decode via libav* regardless of container, bypassing
// the first-party FLAC/WAV decoders — tests cross-validate our codec
// against ffmpeg's independently (encoder out → ffmpeg in, and vice versa).
int na_decode_oracle(const char* path, float** out, long* n_out, int* sr_out) {
  std::vector<float> mono;
  int rc = decode_libav(path, &mono, sr_out, &g_err, nullptr);
  if (rc) return rc;
  return to_heap(mono, out, n_out);
}

double na_peak_dbfs(const float* x, long n) {
  float peak = 0;
  for (long i = 0; i < n; ++i) peak = std::max(peak, std::fabs(x[i]));
  if (peak <= 0) return -1e30;
  return 20.0 * std::log10((double)peak);
}

}  // extern "C"
