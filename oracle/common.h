// Oracle common types + colio binary format (N5, SURVEY.md §2.3).
// Independent single-threaded C++ implementation of the operator semantics
// of the reference (dryman/HashMergeJoin; mount empty — spec BASELINE.json:L5).
// Deliberately uses different internals from the engine so bugs don't
// correlate (SURVEY.md §4.4.1).
#pragma once

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace oracle {

// i64-only columns: every benchmark relation is int64 keys + int64 payloads
// (BASELINE.json:L7-L9).
struct Column {
  std::string name;
  std::vector<int64_t> data;
};

struct Tab {
  std::vector<Column> cols;
  size_t nrows() const { return cols.empty() ? 0 : cols[0].data.size(); }
  Column* find(const std::string& name) {
    for (auto& c : cols)
      if (c.name == name) return &c;
    return nullptr;
  }
};

// ---- colio (mirrors tpq/colio.py) -----------------------------------------
inline void colio_dump(const std::string& path, const Tab& t) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) throw std::runtime_error("cannot open " + path);
  fwrite("TPQC", 1, 4, f);
  uint32_t ver = 1, ncols = (uint32_t)t.cols.size();
  fwrite(&ver, 4, 1, f);
  fwrite(&ncols, 4, 1, f);
  for (auto& c : t.cols) {
    uint32_t nl = (uint32_t)c.name.size();
    fwrite(&nl, 4, 1, f);
    fwrite(c.name.data(), 1, nl, f);
    uint32_t code = 1;  // int64
    uint64_t nrows = c.data.size();
    fwrite(&code, 4, 1, f);
    fwrite(&nrows, 8, 1, f);
    if (nrows) fwrite(c.data.data(), 8, nrows, f);  // empty vec may hold null
  }
  fclose(f);
}

inline Tab colio_load(const std::string& path) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) throw std::runtime_error("cannot open " + path);
  char magic[4];
  if (fread(magic, 1, 4, f) != 4 || memcmp(magic, "TPQC", 4) != 0)
    throw std::runtime_error(path + ": bad magic");
  uint32_t ver, ncols;
  if (fread(&ver, 4, 1, f) != 1 || ver != 1) throw std::runtime_error("bad version");
  if (fread(&ncols, 4, 1, f) != 1) throw std::runtime_error("truncated");
  Tab t;
  for (uint32_t i = 0; i < ncols; i++) {
    uint32_t nl;
    if (fread(&nl, 4, 1, f) != 1) throw std::runtime_error("truncated");
    std::string name(nl, 0);
    if (nl && fread(name.data(), 1, nl, f) != nl) throw std::runtime_error("truncated");
    uint32_t code;
    uint64_t nrows;
    if (fread(&code, 4, 1, f) != 1 || fread(&nrows, 8, 1, f) != 1)
      throw std::runtime_error("truncated");
    if (code != 1) throw std::runtime_error("oracle supports int64 columns only");
    Column c;
    c.name = name;
    c.data.resize(nrows);
    if (nrows && fread(c.data.data(), 8, nrows, f) != nrows)
      throw std::runtime_error("truncated data");
    t.cols.push_back(std::move(c));
  }
  fclose(f);
  return t;
}

// ---- canonical order (SURVEY.md §4.4.2) -----------------------------------
// Rows sorted lexicographically by columns in file order; this is the
// bit-exactness comparison form.
inline void canonicalize(Tab& t) {
  size_t n = t.nrows();
  std::vector<uint32_t> idx(n);
  for (size_t i = 0; i < n; i++) idx[i] = (uint32_t)i;
  std::sort(idx.begin(), idx.end(), [&](uint32_t a, uint32_t b) {
    for (auto& c : t.cols) {
      if (c.data[a] != c.data[b]) return c.data[a] < c.data[b];
    }
    return false;
  });
  for (auto& c : t.cols) {
    std::vector<int64_t> nd(n);
    for (size_t i = 0; i < n; i++) nd[i] = c.data[idx[i]];
    c.data.swap(nd);
  }
}

// FNV-1a over the canonical byte stream (names + data).
inline uint64_t checksum(const Tab& t) {
  uint64_t h = 1469598103934665603ull;
  auto mix = [&](const void* p, size_t n) {
    const uint8_t* b = (const uint8_t*)p;
    for (size_t i = 0; i < n; i++) {
      h ^= b[i];
      h *= 1099511628211ull;
    }
  };
  for (auto& c : t.cols) {
    mix(c.name.data(), c.name.size());
    mix(c.data.data(), c.data.size() * 8);
  }
  return h;
}

}  // namespace oracle
