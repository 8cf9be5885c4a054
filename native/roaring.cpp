// Roaring-style compressed bitmap for uint32 keys, exposed via a C ABI for
// ctypes. Host-runtime replacement for the reference's pyroaring dependency
// (seen/accepted/returned sets in seesaw/seesaw_session.py:21-22,
// seesaw/query_interface.py:19). Design follows the classic roaring layout:
// the key space is split into 2^16 chunks; each chunk is stored either as a
// sorted uint16 array (cardinality <= 4096) or as a 65536-bit bitset.
//
// Build: g++ -O2 -shared -fPIC -o libroaring_tpu.so roaring.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

namespace {

constexpr size_t kArrayMax = 4096;
constexpr size_t kBitsetWords = 65536 / 64;

struct Container {
  // invariant: exactly one representation active; array is sorted unique.
  bool is_bitset = false;
  std::vector<uint16_t> array;
  std::vector<uint64_t> bits;  // kBitsetWords when is_bitset
  uint32_t cardinality = 0;

  void to_bitset() {
    if (is_bitset) return;
    bits.assign(kBitsetWords, 0);
    for (uint16_t v : array) bits[v >> 6] |= (1ull << (v & 63));
    array.clear();
    array.shrink_to_fit();
    is_bitset = true;
  }

  void maybe_to_array() {
    if (!is_bitset || cardinality > kArrayMax) return;
    std::vector<uint16_t> out;
    out.reserve(cardinality);
    for (size_t w = 0; w < kBitsetWords; ++w) {
      uint64_t word = bits[w];
      while (word) {
        int b = __builtin_ctzll(word);
        out.push_back(static_cast<uint16_t>((w << 6) | b));
        word &= word - 1;
      }
    }
    array = std::move(out);
    bits.clear();
    bits.shrink_to_fit();
    is_bitset = false;
  }

  bool add(uint16_t v) {
    if (is_bitset) {
      uint64_t& word = bits[v >> 6];
      uint64_t mask = 1ull << (v & 63);
      if (word & mask) return false;
      word |= mask;
      ++cardinality;
      return true;
    }
    auto it = std::lower_bound(array.begin(), array.end(), v);
    if (it != array.end() && *it == v) return false;
    array.insert(it, v);
    ++cardinality;
    if (cardinality > kArrayMax) to_bitset();
    return true;
  }

  bool remove(uint16_t v) {
    if (is_bitset) {
      uint64_t& word = bits[v >> 6];
      uint64_t mask = 1ull << (v & 63);
      if (!(word & mask)) return false;
      word &= ~mask;
      --cardinality;
      maybe_to_array();
      return true;
    }
    auto it = std::lower_bound(array.begin(), array.end(), v);
    if (it == array.end() || *it != v) return false;
    array.erase(it);
    --cardinality;
    return true;
  }

  bool contains(uint16_t v) const {
    if (is_bitset) return bits[v >> 6] & (1ull << (v & 63));
    return std::binary_search(array.begin(), array.end(), v);
  }

  template <typename F>
  void for_each(F&& f) const {  // ascending order
    if (is_bitset) {
      for (size_t w = 0; w < kBitsetWords; ++w) {
        uint64_t word = bits[w];
        while (word) {
          int b = __builtin_ctzll(word);
          f(static_cast<uint16_t>((w << 6) | b));
          word &= word - 1;
        }
      }
    } else {
      for (uint16_t v : array) f(v);
    }
  }
};

struct Roaring {
  std::map<uint16_t, Container> chunks;  // ordered by high 16 bits
  uint64_t cardinality = 0;
};

inline uint16_t hi(uint32_t v) { return static_cast<uint16_t>(v >> 16); }
inline uint16_t lo(uint32_t v) { return static_cast<uint16_t>(v & 0xffff); }

}  // namespace

extern "C" {

Roaring* rb_create() { return new Roaring(); }

void rb_free(Roaring* r) { delete r; }

void rb_add(Roaring* r, uint32_t v) {
  if (r->chunks[hi(v)].add(lo(v))) ++r->cardinality;
}

void rb_add_many(Roaring* r, const uint32_t* vals, uint64_t n) {
  for (uint64_t i = 0; i < n; ++i) rb_add(r, vals[i]);
}

void rb_remove(Roaring* r, uint32_t v) {
  auto it = r->chunks.find(hi(v));
  if (it == r->chunks.end()) return;
  if (it->second.remove(lo(v))) {
    --r->cardinality;
    if (it->second.cardinality == 0) r->chunks.erase(it);
  }
}

int rb_contains(const Roaring* r, uint32_t v) {
  auto it = r->chunks.find(hi(v));
  return it != r->chunks.end() && it->second.contains(lo(v));
}

void rb_contains_many(const Roaring* r, const uint32_t* vals, uint64_t n,
                      uint8_t* out) {
  for (uint64_t i = 0; i < n; ++i) out[i] = rb_contains(r, vals[i]);
}

uint64_t rb_cardinality(const Roaring* r) { return r->cardinality; }

void rb_clear(Roaring* r) {
  r->chunks.clear();
  r->cardinality = 0;
}

// Writes all members ascending into out (caller allocates rb_cardinality).
void rb_to_array(const Roaring* r, uint32_t* out) {
  uint64_t i = 0;
  for (const auto& [high, c] : r->chunks) {
    uint32_t base = static_cast<uint32_t>(high) << 16;
    c.for_each([&](uint16_t v) { out[i++] = base | v; });
  }
}

Roaring* rb_copy(const Roaring* r) { return new Roaring(*r); }

void rb_union_update(Roaring* dst, const Roaring* src) {
  for (const auto& [high, c] : src->chunks) {
    uint32_t base = static_cast<uint32_t>(high) << 16;
    c.for_each([&](uint16_t v) { rb_add(dst, base | v); });
  }
}

Roaring* rb_difference(const Roaring* a, const Roaring* b) {
  auto* out = new Roaring();
  for (const auto& [high, c] : a->chunks) {
    uint32_t base = static_cast<uint32_t>(high) << 16;
    auto itb = b->chunks.find(high);
    c.for_each([&](uint16_t v) {
      if (itb == b->chunks.end() || !itb->second.contains(v))
        rb_add(out, base | v);
    });
  }
  return out;
}

Roaring* rb_intersection(const Roaring* a, const Roaring* b) {
  auto* out = new Roaring();
  for (const auto& [high, c] : a->chunks) {
    auto itb = b->chunks.find(high);
    if (itb == b->chunks.end()) continue;
    uint32_t base = static_cast<uint32_t>(high) << 16;
    c.for_each([&](uint16_t v) {
      if (itb->second.contains(v)) rb_add(out, base | v);
    });
  }
  return out;
}

int rb_equals(const Roaring* a, const Roaring* b) {
  if (a->cardinality != b->cardinality) return 0;
  for (const auto& [high, c] : a->chunks) {
    auto itb = b->chunks.find(high);
    if (itb == b->chunks.end()) return 0;
    bool ok = true;
    c.for_each([&](uint16_t v) { ok = ok && itb->second.contains(v); });
    if (!ok) return 0;
  }
  return 1;
}

}  // extern "C"
