// PCT1 interleaved rANS — native host implementation (C ABI for ctypes).
//
// Same wire format as coder/rans_numpy.py / coder/rans_device.py (see
// coder/tables.py for the spec): K 32-bit lane states, L = 2^16, 16-bit
// renormalization words, one shared payload stream ordered
// (stage, position, lane) in decode order, lane-state header of 2K words,
// masked symbols skipped.  Out-of-support symbols are coded losslessly
// via the escape extension: the row's sentinel index (max_symbol + 1, the
// tail entry) goes into the rANS stream and the exact int32 value is
// appended to the escape segment (lo16, hi16 uint16 pairs in decode
// order) following the payload.  Encode returns the total word count and
// writes the escape-segment start index via esc_start_out.
//
// This is the fast host path (pipelines that want CPU-side coding, e.g.
// bitstream re-mux tools) and the ground-truth cross-check for the device
// coder.  Fresh implementation; the reference's coder
// (/root/reference/src/compress/cpp_exts/rans) is a different (64-bit,
// single-lane, bypass-escape) design.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC rans.cpp -o librans_pct1.so

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kL = 1u << 16;
constexpr uint32_t kMask16 = 0xFFFFu;

// Binary search: greatest s with cdf[s] <= cum (row strictly increasing).
inline int32_t find_symbol(const int32_t* row, int32_t n_sym, uint32_t cum) {
  int32_t lo = 0, hi = n_sym;  // invariant: cdf[lo] <= cum < cdf[hi+1]
  while (lo < hi) {
    int32_t mid = (lo + hi + 1) >> 1;
    if (static_cast<uint32_t>(row[mid]) <= cum)
      lo = mid;
    else
      hi = mid - 1;
  }
  return lo;
}

}  // namespace

extern "C" {

// Returns total words written (header + payload + escape segment), or -1
// if out_cap too small; *esc_start_out = word index where escapes begin.
int64_t pct1_encode(const int32_t* symbols, const int32_t* indexes,
                    const uint8_t* keep, const int64_t* stage_sizes,
                    int32_t n_stages, const int32_t* cdf, int32_t cdf_rows,
                    int32_t cdf_stride, const int32_t* cdf_length,
                    const int32_t* offsets, int32_t lanes, uint16_t* out,
                    int64_t out_cap, int64_t* esc_start_out) {
  std::vector<uint32_t> states(lanes, kL);
  // Payload chunks in reverse global order; reversed once at the end.
  std::vector<std::vector<uint16_t>> chunks_rev;
  std::vector<uint16_t> esc_words;  // forward (decode) order

  int64_t total = 0;
  for (int s = 0; s < n_stages; ++s) total += stage_sizes[s];

  // Escape segment: exact raw values, forward stage/position/lane order.
  int64_t base = 0;
  for (int s = 0; s < n_stages; ++s) {
    const int64_t n = stage_sizes[s];
    for (int64_t i = 0; i < n; ++i) {
      if (!keep[base + i]) continue;
      const int32_t row_idx = indexes[base + i];
      const int32_t max_sym = cdf_length[row_idx] - 3;
      const int32_t v = symbols[base + i] - offsets[row_idx];
      if (v < 0 || v > max_sym) {
        const uint32_t raw = static_cast<uint32_t>(symbols[base + i]);
        esc_words.push_back(static_cast<uint16_t>(raw & kMask16));
        esc_words.push_back(static_cast<uint16_t>(raw >> 16));
      }
    }
    base += n;
  }

  // Walk stages in reverse; within a stage positions in reverse.
  int64_t stage_base = total;
  for (int s = n_stages - 1; s >= 0; --s) {
    const int64_t n = stage_sizes[s];
    stage_base -= n;
    const int64_t P = (n + lanes - 1) / lanes;
    for (int64_t p = P - 1; p >= 0; --p) {
      std::vector<uint16_t> words;
      for (int32_t l = 0; l < lanes; ++l) {
        const int64_t i = p * lanes + l;
        if (i >= n || !keep[stage_base + i]) continue;
        const int32_t row_idx = indexes[stage_base + i];
        const int32_t* row = cdf + static_cast<int64_t>(row_idx) * cdf_stride;
        const int32_t max_sym = cdf_length[row_idx] - 3;
        int32_t v = symbols[stage_base + i] - offsets[row_idx];
        v = (v < 0 || v > max_sym) ? max_sym + 1 : v;  // escape sentinel
        const uint32_t start = static_cast<uint32_t>(row[v]);
        const uint32_t freq = static_cast<uint32_t>(row[v + 1]) - start;
        uint32_t x = states[l];
        const uint64_t x_max = static_cast<uint64_t>(freq) << 16;
        if (x >= x_max) {
          words.push_back(static_cast<uint16_t>(x & kMask16));
          x >>= 16;
        }
        states[l] = ((x / freq) << 16) + (x % freq) + start;
      }
      if (!words.empty()) chunks_rev.push_back(std::move(words));
    }
  }

  int64_t n_payload = 0;
  for (const auto& c : chunks_rev) n_payload += static_cast<int64_t>(c.size());
  const int64_t esc_start = 2 * lanes + n_payload;
  const int64_t n_words = esc_start + static_cast<int64_t>(esc_words.size());
  if (n_words > out_cap) return -1;

  for (int32_t l = 0; l < lanes; ++l) {
    out[2 * l] = static_cast<uint16_t>(states[l] & kMask16);
    out[2 * l + 1] = static_cast<uint16_t>(states[l] >> 16);
  }
  int64_t w = 2 * lanes;
  for (auto it = chunks_rev.rbegin(); it != chunks_rev.rend(); ++it) {
    std::memcpy(out + w, it->data(), it->size() * sizeof(uint16_t));
    w += static_cast<int64_t>(it->size());
  }
  if (!esc_words.empty())
    std::memcpy(out + w, esc_words.data(), esc_words.size() * sizeof(uint16_t));
  if (esc_start_out) *esc_start_out = esc_start;
  return n_words;
}

// Returns 1 if every lane state returned to L (stream consistent), else 0;
// -1 if the stream ran out of words.
int32_t pct1_decode(const uint16_t* stream, int64_t n_words,
                    int64_t esc_start, const int32_t* indexes,
                    const uint8_t* keep, const int64_t* stage_sizes,
                    int32_t n_stages, const int32_t* cdf, int32_t cdf_rows,
                    int32_t cdf_stride, const int32_t* cdf_length,
                    const int32_t* offsets, int32_t lanes,
                    int32_t* out_values) {
  std::vector<uint32_t> states(lanes);
  for (int32_t l = 0; l < lanes; ++l) {
    states[l] = static_cast<uint32_t>(stream[2 * l]) |
                (static_cast<uint32_t>(stream[2 * l + 1]) << 16);
  }
  int64_t pos = 2 * lanes;
  if (esc_start < 0) esc_start = n_words;  // no escape segment
  int64_t esc_pos = esc_start;

  int64_t stage_base = 0;
  for (int s = 0; s < n_stages; ++s) {
    const int64_t n = stage_sizes[s];
    const int64_t P = (n + lanes - 1) / lanes;
    for (int64_t p = 0; p < P; ++p) {
      for (int32_t l = 0; l < lanes; ++l) {
        const int64_t i = p * lanes + l;
        if (i >= n) continue;
        if (!keep[stage_base + i]) {
          out_values[stage_base + i] = 0;
          continue;
        }
        const int32_t row_idx = indexes[stage_base + i];
        const int32_t* row = cdf + static_cast<int64_t>(row_idx) * cdf_stride;
        const int32_t n_sym = cdf_length[row_idx] - 2;  // incl. tail entry
        uint32_t x = states[l];
        const uint32_t cum = x & kMask16;
        const int32_t sym = find_symbol(row, n_sym, cum);
        const uint32_t start = static_cast<uint32_t>(row[sym]);
        const uint32_t freq = static_cast<uint32_t>(row[sym + 1]) - start;
        x = freq * (x >> 16) + cum - start;
        if (x < kL) {
          if (pos >= esc_start) return -1;
          x = (x << 16) | static_cast<uint32_t>(stream[pos++]);
        }
        states[l] = x;
        if (sym > cdf_length[row_idx] - 3) {  // sentinel -> escape raw value
          if (esc_pos + 1 >= n_words) return -1;
          const uint32_t raw = static_cast<uint32_t>(stream[esc_pos]) |
                               (static_cast<uint32_t>(stream[esc_pos + 1]) << 16);
          esc_pos += 2;
          out_values[stage_base + i] = static_cast<int32_t>(raw);
        } else {
          out_values[stage_base + i] = sym + offsets[row_idx];
        }
      }
    }
    stage_base += n;
  }

  for (int32_t l = 0; l < lanes; ++l)
    if (states[l] != kL) return 0;
  if (pos != esc_start || esc_pos != n_words) return 0;
  return 1;
}

}  // extern "C"
