// N2 — LSD radix sort on int64 keys with permutation output (oracle twin of
// the engine's Pallas radix sort, SURVEY.md §2.3 N2; reference capability
// "radix sort for the merge path", BASELINE.json:L5).
#pragma once

#include <cstdint>
#include <vector>

namespace oracle {

// Returns the permutation that stably sorts `keys` ascending (int64 order).
// 8 bits per pass, 8 passes; sign handled by biasing to uint64.
inline std::vector<uint32_t> radix_sort_perm(const std::vector<int64_t>& keys) {
  const size_t n = keys.size();
  std::vector<uint32_t> perm(n), tmp(n);
  for (size_t i = 0; i < n; i++) perm[i] = (uint32_t)i;
  std::vector<uint64_t> biased(n);
  for (size_t i = 0; i < n; i++)
    biased[i] = (uint64_t)keys[i] ^ 0x8000000000000000ull;  // order-preserving
  for (int pass = 0; pass < 8; pass++) {
    const int sh = pass * 8;
    size_t hist[257] = {0};
    for (size_t i = 0; i < n; i++) hist[((biased[perm[i]] >> sh) & 0xFF) + 1]++;
    for (int b = 0; b < 256; b++) hist[b + 1] += hist[b];
    for (size_t i = 0; i < n; i++) {
      const uint64_t b = (biased[perm[i]] >> sh) & 0xFF;
      tmp[hist[b]++] = perm[i];
    }
    perm.swap(tmp);
  }
  return perm;
}

}  // namespace oracle
