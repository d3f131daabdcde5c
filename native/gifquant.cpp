// GIF quantization with Go-stdlib semantics.
//
// The reference encodes GIF outputs via gif.Encode(w, img, nil)
// (reference: internal/usecase/processor/operations/resize.go:98-119),
// which for a non-paletted source quantizes to the fixed 256-color
// Plan9 palette and dithers with draw.FloydSteinberg
// (Go image/gif/writer.go + image/draw/draw.go drawPaletted).
// This file reimplements that pipeline bit-for-bit:
//
//  * Plan9 palette: the 4x4x4x4 generator from Go
//    image/color/palette/gen.go (black first, white last).
//  * Color distance: color.sqDiff — uint32(d*d) >> 2 per channel, summed
//    over R,G,B (alpha is constant 0xffff on both sides here).
//  * Palette search: linear scan, strict improvement, first minimal
//    index wins, early exit on an exact match — same tie-breaking as
//    Go's loop.
//  * Floyd-Steinberg: 16-bit color space (8-bit channels replicated,
//    c * 0x101), raw error accumulated with weights 7/3/5/1 and divided
//    by 16 (C++ and Go both truncate toward zero) at consumption,
//    clamped to [0, 0xffff] — the exact drawPaletted arithmetic.
//
// Output indices decoded through the emitted palette are therefore
// pixel-identical to Go's gif.Encode quantization of the same RGB
// input (the LZW layer on top is lossless and may differ byte-wise).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Plan9Palette {
  int32_t c16[256][3];  // 16-bit components (c * 0x101), Go RGBA() scale
  uint8_t c8[256][3];

  Plan9Palette() {
    int i = 0;
    for (int r = 0; r != 4; ++r) {
      for (int v = 0; v != 4; ++v) {
        for (int g = 0; g != 4; ++g) {
          for (int b = 0; b != 4; ++b, ++i) {
            int den = r;
            if (g > den) den = g;
            if (b > den) den = b;
            int cr, cg, cb;
            if (den == 0) {
              cr = cg = cb = 0x11 * v;
            } else {
              const int num = 17 * (4 * den + v);
              cr = r * num / den;
              cg = g * num / den;
              cb = b * num / den;
            }
            c8[i][0] = static_cast<uint8_t>(cr);
            c8[i][1] = static_cast<uint8_t>(cg);
            c8[i][2] = static_cast<uint8_t>(cb);
            c16[i][0] = cr * 0x101;
            c16[i][1] = cg * 0x101;
            c16[i][2] = cb * 0x101;
          }
        }
      }
    }
  }
};

const Plan9Palette kPlan9;

inline uint32_t sq_diff(int32_t x, int32_t y) {
  // Go color.sqDiff: uint32(d*d) >> 2, where the int32 square WRAPS
  // for |d| > 46340 (Go defines signed wraparound; C++ does not, so
  // square in uint32 — same bits, no UB).
  const uint32_t d = static_cast<uint32_t>(x - y);
  return (d * d) >> 2;
}

inline int32_t clamp16(int32_t v) {
  if (v < 0) return 0;
  if (v > 0xffff) return 0xffff;
  return v;
}

}  // namespace

extern "C" {

// Quantize (h, w, 3) uint8 RGB rows (row_stride bytes apart) to Plan9
// indices, optionally Floyd-Steinberg dithered (dither != 0 — the
// gif.Encode default). out_idx: h*w bytes. out_palette (optional):
// 256*3 bytes, the Plan9 colors in index order. Returns 0.
int ip_gif_quantize_plan9(const uint8_t* rgb, int w, int h,
                          long row_stride, int dither,
                          uint8_t* out_idx, uint8_t* out_palette) {
  if (rgb == nullptr || out_idx == nullptr || w <= 0 || h <= 0) return -1;
  if (out_palette != nullptr)
    memcpy(out_palette, kPlan9.c8, sizeof(kPlan9.c8));

  // quantError rows in Go's layout: Dx+2 entries of [r,g,b]; pixel x
  // consumes index x+1 and distributes to curr[x+2], next[x..x+2].
  std::vector<int32_t> curr(static_cast<size_t>(w + 2) * 3, 0);
  std::vector<int32_t> next(static_cast<size_t>(w + 2) * 3, 0);

  for (int y = 0; y < h; ++y) {
    const uint8_t* row = rgb + static_cast<size_t>(y) * row_stride;
    uint8_t* out_row = out_idx + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      int32_t er = row[x * 3 + 0] * 0x101;
      int32_t eg = row[x * 3 + 1] * 0x101;
      int32_t eb = row[x * 3 + 2] * 0x101;
      if (dither) {
        int32_t* e = &curr[static_cast<size_t>(x + 1) * 3];
        er = clamp16(er + e[0] / 16);
        eg = clamp16(eg + e[1] / 16);
        eb = clamp16(eb + e[2] / 16);
      }
      int best = 0;
      uint32_t best_sum = 0xFFFFFFFFu;
      for (int i = 0; i < 256; ++i) {
        const uint32_t sum = sq_diff(er, kPlan9.c16[i][0])
                             + sq_diff(eg, kPlan9.c16[i][1])
                             + sq_diff(eb, kPlan9.c16[i][2]);
        if (sum < best_sum) {
          best = i;
          best_sum = sum;
          if (sum == 0) break;
        }
      }
      out_row[x] = static_cast<uint8_t>(best);
      if (!dither) continue;
      er -= kPlan9.c16[best][0];
      eg -= kPlan9.c16[best][1];
      eb -= kPlan9.c16[best][2];
      int32_t* c2 = &curr[static_cast<size_t>(x + 2) * 3];
      int32_t* n0 = &next[static_cast<size_t>(x + 0) * 3];
      int32_t* n1 = &next[static_cast<size_t>(x + 1) * 3];
      int32_t* n2 = &next[static_cast<size_t>(x + 2) * 3];
      c2[0] += er * 7;
      c2[1] += eg * 7;
      c2[2] += eb * 7;
      n0[0] += er * 3;
      n0[1] += eg * 3;
      n0[2] += eb * 3;
      n1[0] += er * 5;
      n1[1] += eg * 5;
      n1[2] += eb * 5;
      n2[0] += er * 1;
      n2[1] += eg * 1;
      n2[2] += eb * 1;
    }
    if (dither) {
      curr.swap(next);
      std::memset(next.data(), 0, next.size() * sizeof(int32_t));
    }
  }
  return 0;
}

}  // extern "C"
