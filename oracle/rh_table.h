// N1 — robin-hood open-addressing hash table (oracle twin of the engine's
// Pallas rh_table kernel, SURVEY.md §2.3 N1). Mirrors the reference's
// primitive family (BASELINE.json:L5 "open-addressing/robin-hood tables";
// PAPERS.md "Concurrent Robin Hood Hashing" is the genre).
//
// Multiplicative (Fibonacci) hash, pow2 capacity, robin-hood displacement
// swap on insert, early-exit lookup on displacement bound. Supports
// duplicate keys: insert keeps every entry; lookup_all visits all matches.
#pragma once

#include <cstdint>
#include <vector>

namespace oracle {

class RHTable {
 public:
  struct Entry {
    int64_t key;
    uint32_t value;  // row index in the build relation
    int32_t dist;    // probe distance from home slot; -1 = empty
  };

  explicit RHTable(size_t expected) {
    size_t cap = 16;
    while (cap < expected * 2) cap <<= 1;  // load factor <= 0.5
    mask_ = cap - 1;
    shift_ = 64 - __builtin_ctzll(cap);
    slots_.assign(cap, Entry{0, 0, -1});
  }

  size_t capacity() const { return slots_.size(); }

  size_t home(int64_t key) const {
    uint64_t h = (uint64_t)key * 0x9E3779B97F4A7C15ull;
    return (size_t)(h >> shift_) & mask_;
  }

  void insert(int64_t key, uint32_t value) {
    Entry e{key, value, 0};
    size_t s = home(key);
    for (;;) {
      Entry& cur = slots_[s];
      if (cur.dist < 0) {
        cur = e;
        return;
      }
      if (cur.dist < e.dist) std::swap(cur, e);  // robin hood: rich yields
      e.dist++;
      s = (s + 1) & mask_;
    }
  }

  // Visit every entry whose key == key. Robin-hood invariant: along the
  // probe sequence entries are sorted by displacement, so once we see an
  // entry whose displacement is smaller than our travel distance, key is
  // absent beyond it.
  template <typename F>
  void lookup_all(int64_t key, F&& f) const {
    size_t s = home(key);
    for (int32_t d = 0;; d++, s = (s + 1) & mask_) {
      const Entry& cur = slots_[s];
      if (cur.dist < 0 || cur.dist < d) return;
      if (cur.key == key) f(cur.value);
    }
  }

 private:
  std::vector<Entry> slots_;
  size_t mask_;
  int shift_;
};

}  // namespace oracle
