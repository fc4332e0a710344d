// N4 — seed-stable benchmark relation generator, C++ side of the shared
// bitstream contract with tpq/datagen.py (SURVEY.md §4.4.3). Both sides
// implement exactly: splitmix64 over a salted counter; zipf via double
// inverse-CDF with index-order summation; identical constants.
#pragma once

#include <cmath>
#include <cstdint>
#include <string>
#include <vector>

#include "common.h"

namespace oracle {

constexpr uint64_t kGolden = 0x9E3779B97F4A7C15ull;
constexpr uint64_t kStreamMul = 0xD1342543DE82EF95ull;
constexpr uint64_t kPayloadSalt = 0xA5A5A5A5DEADBEEFull;

inline uint64_t splitmix64(uint64_t x) {
  uint64_t z = x + kGolden;
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

inline uint64_t stream(uint64_t seed, uint64_t idx) {
  return splitmix64(seed ^ (idx * kStreamMul));
}

inline Tab gen_relation(uint64_t rows, uint64_t nkeys, int payloads, uint64_t seed,
                        const std::string& kind, double theta) {
  Tab t;
  Column key;
  key.name = "key";
  key.data.resize(rows);
  if (kind == "uniform") {
    for (uint64_t i = 0; i < rows; i++)
      key.data[i] = (int64_t)(stream(seed, i) % nkeys);
  } else if (kind == "zipf") {
    std::vector<double> cdf(nkeys);
    double acc = 0;
    for (uint64_t k = 0; k < nkeys; k++) {
      acc += std::pow((double)(k + 1), -theta);
      cdf[k] = acc;
    }
    const double total = cdf[nkeys - 1];
    for (uint64_t i = 0; i < rows; i++) {
      const double u = (double)(stream(seed, i) >> 11) * (1.0 / 9007199254740992.0);
      const double target = u * total;
      // first index where cdf[k] > target (np.searchsorted side='right')
      auto it = std::upper_bound(cdf.begin(), cdf.end(), target);
      uint64_t k = (uint64_t)(it - cdf.begin());
      if (k > nkeys - 1) k = nkeys - 1;
      key.data[i] = (int64_t)k;
    }
  } else {
    throw std::runtime_error("unknown kind " + kind);
  }
  t.cols.push_back(std::move(key));
  for (int j = 0; j < payloads; j++) {
    Column c;
    c.name = "p" + std::to_string(j);
    c.data.resize(rows);
    for (uint64_t i = 0; i < rows; i++)
      c.data[i] = (int64_t)(stream(seed ^ kPayloadSalt, i * (uint64_t)payloads + (uint64_t)j) >> 1);
    t.cols.push_back(std::move(c));
  }
  return t;
}

}  // namespace oracle
