// Native packing/conversion kernels for the export + checkpoint-IO path.
//
// The reference's real-quant export packs weights with python/numpy loops
// (/root/reference/llmc/compression/quantization/module_utils.py:836-862,
// 1004-1065); at 405B scale that is minutes of single-threaded CPU.  These
// are multithreaded C++ equivalents exposed through ctypes
// (llmc_tpu/native/__init__.py), with numpy fallbacks when the shared
// library is unavailable.
//
// Build: make -C llmc_tpu/native  (g++ -O3 -shared; no external deps).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// run fn(row_begin, row_end) across hardware threads
template <typename F>
void parallel_rows(int64_t n_rows, F fn) {
  unsigned n_thr = std::thread::hardware_concurrency();
  if (n_thr == 0) n_thr = 1;
  if (n_rows < (int64_t)n_thr * 4) {  // small: stay single-threaded
    fn(0, n_rows);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_rows + n_thr - 1) / n_thr;
  for (unsigned t = 0; t < n_thr; ++t) {
    int64_t b = t * chunk;
    int64_t e = b + chunk < n_rows ? b + chunk : n_rows;
    if (b >= e) break;
    threads.emplace_back([=] { fn(b, e); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// group-pair int4 packing (matches ops/dequant_matmul.pack_weight): for
// each pair of adjacent gs-column groups, byte c stores col 2g*gs+c (lo)
// and (2g+1)*gs+c (hi); a single-group layer pairs its two halves
void pack_int4_colsplit(const uint8_t* codes, int8_t* out, int64_t N,
                        int64_t K, int64_t gs) {
  const int64_t span = (K == gs) ? K : 2 * gs;
  const int64_t half = span / 2, np = K / span;
  parallel_rows(N, [=](int64_t r0, int64_t r1) {
    for (int64_t n = r0; n < r1; ++n) {
      const uint8_t* row = codes + n * K;
      int8_t* orow = out + n * (K / 2);
      for (int64_t p = 0; p < np; ++p) {
        const uint8_t* grp = row + p * span;
        int8_t* ogrp = orow + p * half;
        for (int64_t c = 0; c < half; ++c) {
          ogrp[c] = (int8_t)((grp[c] & 0xF) | ((grp[c + half] & 0xF) << 4));
        }
      }
    }
  });
}

void unpack_int4_colsplit(const int8_t* packed, uint8_t* out, int64_t N,
                          int64_t K, int64_t gs) {
  const int64_t span = (K == gs) ? K : 2 * gs;
  const int64_t half = span / 2, np = K / span;
  parallel_rows(N, [=](int64_t r0, int64_t r1) {
    for (int64_t n = r0; n < r1; ++n) {
      const uint8_t* row = (const uint8_t*)(packed + n * (K / 2));
      uint8_t* orow = out + n * K;
      for (int64_t p = 0; p < np; ++p) {
        const uint8_t* grp = row + p * half;
        uint8_t* ogrp = orow + p * span;
        for (int64_t c = 0; c < half; ++c) {
          ogrp[c] = grp[c] & 0xF;
          ogrp[c + half] = grp[c] >> 4;
        }
      }
    }
  });
}

// compressed-tensors shift-pack: unsigned codes [N,K] -> int32 [N, K/pf],
// value i at bit position bits*(i % pf) (module_utils.py:836-862)
void pack_int32_rows(const uint8_t* codes, int32_t* out, int64_t N,
                     int64_t K, int64_t bits) {
  const int64_t pf = 32 / bits;
  const int64_t Kp = (K + pf - 1) / pf;
  parallel_rows(N, [=](int64_t r0, int64_t r1) {
    for (int64_t n = r0; n < r1; ++n) {
      const uint8_t* row = codes + n * K;
      uint32_t* orow = (uint32_t*)(out + n * Kp);
      std::memset(orow, 0, Kp * sizeof(uint32_t));
      for (int64_t k = 0; k < K; ++k) {
        orow[k / pf] |= (uint32_t)(row[k]) << (bits * (k % pf));
      }
    }
  });
}

// AWQ GEMM pack with order map [0,2,4,6,1,3,5,7]: m [R, C] unsigned codes
// -> int32 [R, C/pf]; each output word packs pf consecutive columns
// reordered by the map (module_utils.py:1004-1065)
void pack_awq_order(const uint8_t* m, int32_t* out, int64_t R, int64_t C,
                    int64_t bits) {
  static const int order8[8] = {0, 2, 4, 6, 1, 3, 5, 7};
  static const int order4[4] = {0, 2, 1, 3};
  const int64_t pf = 32 / bits;
  const int* order = (pf == 8) ? order8 : order4;
  parallel_rows(R, [=](int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; ++r) {
      const uint8_t* row = m + r * C;
      uint32_t* orow = (uint32_t*)(out + r * (C / pf));
      for (int64_t g = 0; g < C / pf; ++g) {
        uint32_t w = 0;
        for (int64_t i = 0; i < pf; ++i) {
          w |= (uint32_t)(row[g * pf + order[i]] & ((1u << bits) - 1))
               << (bits * i);
        }
        orow[g] = w;
      }
    }
  });
}

// bf16 (as uint16 view) -> f32, multithreaded
void bf16_to_f32(const uint16_t* in, float* out, int64_t n) {
  parallel_rows(n, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      uint32_t bits = ((uint32_t)in[i]) << 16;
      std::memcpy(&out[i], &bits, 4);
    }
  });
}

// f32 -> bf16 with round-to-nearest-even
void f32_to_bf16(const float* in, uint16_t* out, int64_t n) {
  parallel_rows(n, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      uint32_t bits;
      std::memcpy(&bits, &in[i], 4);
      uint32_t lsb = (bits >> 16) & 1;
      uint32_t rounded = bits + 0x7FFF + lsb;
      out[i] = (uint16_t)(rounded >> 16);
    }
  });
}

}  // extern "C"
