// rANS range coder (64-bit state, 32-bit word renormalization) with
// CompressAI-compatible stream layout, re-implemented from the public
// rANS/CompressAI specification for the TPU build.
//
// The reference consumes this codec through compressai.ans.RansEncoder /
// RansDecoder (ref: src/models/comp_model/hyperprior_dc_vic_model.py:314-319
// and src/models/subnet/context_model/minnen20_charm_context_model.py:179-203).
// Here it is a small C library driven from Python via ctypes; symbols and CDF
// indexes are produced on-device (JAX) and only int32 arrays cross the
// host<->device boundary.
//
// Stream format:
//   * 16-bit probability precision; quantized CDFs sum to 1<<16.
//   * Per-index CDF rows; the last bin (symbol cdf_length-2) is the escape
//     slot: out-of-range values are coded as escape + variable-length 4-bit
//     bypass chunks (count coded first, saturating at 15 per chunk).
//   * Encoder buffers (start, range, bypass) triples and flushes in reverse,
//     so the decoder reads symbols in forward order.
//   * Final state flushed as two little-endian 32-bit words (low, high).

#include <cassert>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using Rans64State = uint64_t;

constexpr uint64_t kRansL = 1ull << 31;
constexpr int kPrecision = 16;
constexpr int kBypassPrecision = 4;
constexpr uint32_t kMaxBypassVal = (1u << kBypassPrecision) - 1;

inline void rans_enc_init(Rans64State *r) { *r = kRansL; }

inline void rans_enc_put(Rans64State *r, uint32_t **pptr, uint32_t start,
                         uint32_t freq, uint32_t scale_bits) {
  uint64_t x = *r;
  const uint64_t x_max = ((kRansL >> scale_bits) << 32) * freq;
  if (x >= x_max) {
    *pptr -= 1;
    **pptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  *r = ((x / freq) << scale_bits) + (x % freq) + start;
}

inline void rans_enc_put_bits(Rans64State *r, uint32_t **pptr, uint32_t val,
                              uint32_t nbits) {
  uint64_t x = *r;
  const uint32_t freq = 1u << (kPrecision - nbits);
  const uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
  if (x >= x_max) {
    *pptr -= 1;
    **pptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  *r = (x << nbits) | val;
}

inline void rans_enc_flush(Rans64State *r, uint32_t **pptr) {
  const uint64_t x = *r;
  *pptr -= 2;
  (*pptr)[0] = static_cast<uint32_t>(x);
  (*pptr)[1] = static_cast<uint32_t>(x >> 32);
}

inline void rans_dec_init(Rans64State *r, uint32_t **pptr) {
  *r = static_cast<uint64_t>((*pptr)[0]) |
       (static_cast<uint64_t>((*pptr)[1]) << 32);
  *pptr += 2;
}

inline uint32_t rans_dec_get(const Rans64State *r, uint32_t scale_bits) {
  return static_cast<uint32_t>(*r & ((1ull << scale_bits) - 1));
}

inline void rans_dec_advance(Rans64State *r, uint32_t **pptr,
                             const uint32_t *end, uint32_t start,
                             uint32_t freq, uint32_t scale_bits) {
  const uint64_t mask = (1ull << scale_bits) - 1;
  uint64_t x = *r;
  x = freq * (x >> scale_bits) + (x & mask) - start;
  if (x < kRansL && *pptr < end) {
    x = (x << 32) | **pptr;
    *pptr += 1;
  }
  *r = x;
}

inline uint32_t rans_dec_get_bits(Rans64State *r, uint32_t **pptr,
                                  const uint32_t *end, uint32_t nbits) {
  uint64_t x = *r;
  const uint32_t val = static_cast<uint32_t>(x & ((1ull << nbits) - 1));
  x >>= nbits;
  if (x < kRansL && *pptr < end) {
    x = (x << 32) | **pptr;
    *pptr += 1;
  }
  *r = x;
  return val;
}

struct RansSym {
  uint16_t start;
  uint16_t range;  // 0 for bypass
  bool bypass;
};

// Push one (symbol, index) pair into the symbol buffer, handling escapes.
inline void push_symbol(std::vector<RansSym> &syms, int32_t symbol,
                        int32_t index, const int32_t *cdfs, int cdf_cols,
                        const int32_t *cdf_lengths, const int32_t *offsets) {
  const int32_t *cdf = cdfs + static_cast<int64_t>(index) * cdf_cols;
  const int32_t max_value = cdf_lengths[index] - 2;
  int32_t value = symbol - offsets[index];

  uint32_t raw_val = 0;
  if (value < 0) {
    raw_val = static_cast<uint32_t>(-2 * value - 1);
    value = max_value;
  } else if (value >= max_value) {
    raw_val = static_cast<uint32_t>(2 * (value - max_value));
    value = max_value;
  }

  syms.push_back(RansSym{static_cast<uint16_t>(cdf[value]),
                         static_cast<uint16_t>(cdf[value + 1] - cdf[value]),
                         false});

  if (value == max_value) {
    // Number of 4-bit chunks in raw_val.
    int32_t n_bypass = 0;
    while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;

    // Chunk count, saturating unary-ish encoding.
    int32_t v = n_bypass;
    while (v >= static_cast<int32_t>(kMaxBypassVal)) {
      syms.push_back(RansSym{static_cast<uint16_t>(kMaxBypassVal), 0, true});
      v -= kMaxBypassVal;
    }
    syms.push_back(RansSym{static_cast<uint16_t>(v), 0, true});

    // Chunks, least significant first.
    for (int32_t j = 0; j < n_bypass; ++j) {
      const uint32_t chunk = (raw_val >> (j * kBypassPrecision)) & kMaxBypassVal;
      syms.push_back(RansSym{static_cast<uint16_t>(chunk), 0, true});
    }
  }
}

// Encode buffered symbols (reverse order) into out; returns byte count.
inline int flush_syms(const std::vector<RansSym> &syms, uint8_t *out,
                      int out_capacity) {
  // Worst case one 32-bit word per symbol plus the 2-word final state.
  const size_t cap_words = syms.size() + 2;
  std::vector<uint32_t> buf(cap_words);
  uint32_t *ptr = buf.data() + cap_words;

  Rans64State rans;
  rans_enc_init(&rans);
  for (auto it = syms.rbegin(); it != syms.rend(); ++it) {
    if (it->bypass) {
      rans_enc_put_bits(&rans, &ptr, it->start, kBypassPrecision);
    } else {
      rans_enc_put(&rans, &ptr, it->start, it->range, kPrecision);
    }
  }
  rans_enc_flush(&rans, &ptr);

  const int nbytes =
      static_cast<int>((buf.data() + cap_words - ptr) * sizeof(uint32_t));
  if (nbytes > out_capacity) return -nbytes;
  std::memcpy(out, ptr, nbytes);
  return nbytes;
}

struct Decoder {
  std::vector<uint32_t> words;
  uint32_t *ptr;
  uint32_t *end;
  Rans64State rans;
};

}  // namespace

extern "C" {

// One-shot encode: symbols[i] coded against cdf row indexes[i].
// Returns bytes written, or negative required size if capacity insufficient.
int dcvic_rans_encode_with_indexes(const int32_t *symbols,
                                   const int32_t *indexes, int n,
                                   const int32_t *cdfs, int cdf_cols,
                                   const int32_t *cdf_lengths,
                                   const int32_t *offsets, uint8_t *out,
                                   int out_capacity) {
  std::vector<RansSym> syms;
  syms.reserve(static_cast<size_t>(n) + 16);
  for (int i = 0; i < n; ++i) {
    push_symbol(syms, symbols[i], indexes[i], cdfs, cdf_cols, cdf_lengths,
                offsets);
  }
  return flush_syms(syms, out, out_capacity);
}

// Streaming decoder (for the channel-autoregressive per-slice decode).
void *dcvic_rans_decoder_new(const uint8_t *stream, int stream_len) {
  auto *dec = new Decoder();
  const size_t n_words = (static_cast<size_t>(stream_len) + 3) / 4;
  dec->words.assign(n_words, 0);
  std::memcpy(dec->words.data(), stream, stream_len);
  dec->ptr = dec->words.data();
  dec->end = dec->words.data() + n_words;
  rans_dec_init(&dec->rans, &dec->ptr);
  return dec;
}

void dcvic_rans_decoder_free(void *handle) {
  delete static_cast<Decoder *>(handle);
}

// Decode n symbols against cdf rows indexes[i]; forward order.
void dcvic_rans_decode_stream(void *handle, const int32_t *indexes, int n,
                              const int32_t *cdfs, int cdf_cols,
                              const int32_t *cdf_lengths,
                              const int32_t *offsets, int32_t *out_symbols) {
  auto *dec = static_cast<Decoder *>(handle);
  for (int i = 0; i < n; ++i) {
    const int32_t index = indexes[i];
    const int32_t *cdf = cdfs + static_cast<int64_t>(index) * cdf_cols;
    const int32_t cdf_len = cdf_lengths[index];
    const int32_t max_value = cdf_len - 2;

    const uint32_t cum = rans_dec_get(&dec->rans, kPrecision);

    // Find s such that cdf[s] <= cum < cdf[s+1] (rows are short; linear scan).
    int32_t s = 0;
    while (s < cdf_len - 1 && static_cast<uint32_t>(cdf[s + 1]) <= cum) ++s;

    rans_dec_advance(&dec->rans, &dec->ptr, dec->end,
                     static_cast<uint32_t>(cdf[s]),
                     static_cast<uint32_t>(cdf[s + 1] - cdf[s]), kPrecision);

    int32_t value = s;
    if (value == max_value) {
      // Bypass-decode the escape value.
      int32_t n_bypass = 0;
      uint32_t val = rans_dec_get_bits(&dec->rans, &dec->ptr, dec->end,
                                       kBypassPrecision);
      n_bypass += static_cast<int32_t>(val);
      while (val == kMaxBypassVal) {
        val = rans_dec_get_bits(&dec->rans, &dec->ptr, dec->end,
                                kBypassPrecision);
        n_bypass += static_cast<int32_t>(val);
      }
      uint32_t raw_val = 0;
      for (int32_t j = 0; j < n_bypass; ++j) {
        val = rans_dec_get_bits(&dec->rans, &dec->ptr, dec->end,
                                kBypassPrecision);
        raw_val |= val << (j * kBypassPrecision);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out_symbols[i] = value + offsets[index];
  }
}

// One-shot decode convenience wrapper.
void dcvic_rans_decode_with_indexes(const uint8_t *stream, int stream_len,
                                    const int32_t *indexes, int n,
                                    const int32_t *cdfs, int cdf_cols,
                                    const int32_t *cdf_lengths,
                                    const int32_t *offsets,
                                    int32_t *out_symbols) {
  void *dec = dcvic_rans_decoder_new(stream, stream_len);
  dcvic_rans_decode_stream(dec, indexes, n, cdfs, cdf_cols, cdf_lengths,
                           offsets, out_symbols);
  dcvic_rans_decoder_free(dec);
}

// Streaming encoder (mirror of the buffered encoder in the reference path).
void *dcvic_rans_encoder_new() { return new std::vector<RansSym>(); }

void dcvic_rans_encoder_free(void *handle) {
  delete static_cast<std::vector<RansSym> *>(handle);
}

void dcvic_rans_encoder_push(void *handle, const int32_t *symbols,
                             const int32_t *indexes, int n,
                             const int32_t *cdfs, int cdf_cols,
                             const int32_t *cdf_lengths,
                             const int32_t *offsets) {
  auto *syms = static_cast<std::vector<RansSym> *>(handle);
  for (int i = 0; i < n; ++i) {
    push_symbol(*syms, symbols[i], indexes[i], cdfs, cdf_cols, cdf_lengths,
                offsets);
  }
}

int dcvic_rans_encoder_flush(void *handle, uint8_t *out, int out_capacity) {
  auto *syms = static_cast<std::vector<RansSym> *>(handle);
  const int nbytes = flush_syms(*syms, out, out_capacity);
  if (nbytes >= 0) syms->clear();
  return nbytes;
}

}  // extern "C"
