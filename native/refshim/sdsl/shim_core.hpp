// shim_core.hpp — minimal, from-scratch stand-ins for the sdsl-lite
// subset consumed by the reference sources (/root/reference), so the
// UNMODIFIED reference can be compiled offline into a golden-test
// oracle binary for mumemto_tpu.
//
// Surface implemented (pinned by the reference call sites):
//   bit_vector (+ nested rank_1_type / select_1_type),
//   rank_support_v<1>, int_vector<W>, rmq_succinct_sct<>,
//   serialize/load/write_member/read_member, structure_tree,
//   util::class_name, size_in_bytes, conf::SDSL_BLOCK_SIZE.
//
// Design notes:
//  - rank/select snapshot the ones-positions at construction (the
//    reference always finishes writing the bit_vector first:
//    dictionary.hpp:123-124, parse.hpp:121, ref_builder.cpp:190).
//  - rmq_succinct_sct copies the source values (pfp.hpp frees the
//    source container after building the RMQ) and answers leftmost
//    argmin on ties; the reference only ever reads the min VALUE
//    (dictionary.hpp:98-99, pfp_lcp_mum.hpp:290-292), so tie order is
//    not load-bearing.
//  - serialization is self-consistent (write/read round-trips through
//    this shim) but NOT byte-compatible with real sdsl-lite; the
//    golden tests never exchange serialized sdsl structures.
//
// TEST INFRASTRUCTURE ONLY — not on any product path of mumemto_tpu.

#ifndef MUMEMTO_SDSL_SHIM_CORE_HPP
#define MUMEMTO_SDSL_SHIM_CORE_HPP

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <istream>
#include <map>
#include <ostream>
#include <string>
#include <type_traits>
#include <unordered_map>
#include <vector>

namespace sdsl {

namespace conf {
constexpr uint64_t SDSL_BLOCK_SIZE = 1ULL << 20;
}

struct structure_tree_node {};
struct structure_tree {
  static structure_tree_node* add_child(structure_tree_node*,
                                        const std::string&,
                                        const std::string&) {
    return nullptr;
  }
  static void add_size(structure_tree_node*, uint64_t) {}
};

namespace util {
template <class T>
inline std::string class_name(const T&) {
  return "shim";
}
}  // namespace util

template <class T>
inline typename std::enable_if<std::is_fundamental<T>::value, uint64_t>::type
serialize(const T& x, std::ostream& out, structure_tree_node* = nullptr,
          std::string = "") {
  out.write(reinterpret_cast<const char*>(&x), sizeof(T));
  return sizeof(T);
}

template <class T>
inline typename std::enable_if<std::is_fundamental<T>::value>::type
load(T& x, std::istream& in) {
  in.read(reinterpret_cast<char*>(&x), sizeof(T));
}

template <class T>
inline uint64_t write_member(const T& x, std::ostream& out,
                             structure_tree_node* = nullptr,
                             std::string = "") {
  static_assert(std::is_fundamental<T>::value, "shim: fundamentals only");
  out.write(reinterpret_cast<const char*>(&x), sizeof(T));
  return sizeof(T);
}

template <class T>
inline void read_member(T& x, std::istream& in) {
  static_assert(std::is_fundamental<T>::value, "shim: fundamentals only");
  in.read(reinterpret_cast<char*>(&x), sizeof(T));
}

template <class T>
inline uint64_t size_in_bytes(const T&) {
  return 0;  // only used inside verbose() diagnostics
}

namespace detail {
inline uint64_t write_u64_vec(const std::vector<uint64_t>& v,
                              std::ostream& out) {
  uint64_t n = v.size();
  out.write(reinterpret_cast<const char*>(&n), sizeof(n));
  if (n)
    out.write(reinterpret_cast<const char*>(v.data()),
              static_cast<std::streamsize>(n * sizeof(uint64_t)));
  return sizeof(n) + n * sizeof(uint64_t);
}
inline void read_u64_vec(std::vector<uint64_t>& v, std::istream& in) {
  uint64_t n = 0;
  in.read(reinterpret_cast<char*>(&n), sizeof(n));
  v.resize(n);
  if (n)
    in.read(reinterpret_cast<char*>(v.data()),
            static_cast<std::streamsize>(n * sizeof(uint64_t)));
}
}  // namespace detail

// --------------------------------------------------------------------------
// bit_vector with nested rank/select supports
// --------------------------------------------------------------------------

class bit_vector {
 public:
  typedef size_t size_type;

  // Snapshot-based supports: rank(i) = #ones in [0, i);
  // select(k) = position of the k-th one (1-based) — sdsl semantics.
  class rank_1_type {
   public:
    rank_1_type() = default;
    explicit rank_1_type(const bit_vector* bv) { init(bv); }
    uint64_t operator()(size_t i) const {
      return static_cast<uint64_t>(
          std::lower_bound(ones_.begin(), ones_.end(), i) - ones_.begin());
    }
    uint64_t serialize(std::ostream& out, structure_tree_node* = nullptr,
                       std::string = "") const {
      return detail::write_u64_vec(ones_, out);
    }
    void load(std::istream& in, const bit_vector* = nullptr) {
      detail::read_u64_vec(ones_, in);
    }

   private:
    void init(const bit_vector* bv) {
      ones_.clear();
      if (!bv) return;
      for (size_t i = 0; i < bv->size(); ++i)
        if ((*bv)[i]) ones_.push_back(i);
    }
    std::vector<uint64_t> ones_;
  };

  class select_1_type {
   public:
    select_1_type() = default;
    explicit select_1_type(const bit_vector* bv) { init(bv); }
    uint64_t operator()(size_t k) const { return ones_[k - 1]; }
    uint64_t serialize(std::ostream& out, structure_tree_node* = nullptr,
                       std::string = "") const {
      return detail::write_u64_vec(ones_, out);
    }
    void load(std::istream& in, const bit_vector* = nullptr) {
      detail::read_u64_vec(ones_, in);
    }

   private:
    void init(const bit_vector* bv) {
      ones_.clear();
      if (!bv) return;
      for (size_t i = 0; i < bv->size(); ++i)
        if ((*bv)[i]) ones_.push_back(i);
    }
    std::vector<uint64_t> ones_;
  };

  bit_vector() = default;
  bit_vector(size_type n, int def) : bits_(n, def != 0) {}

  std::vector<bool>::reference operator[](size_type i) { return bits_[i]; }
  bool operator[](size_type i) const { return bits_[i]; }
  size_type size() const { return bits_.size(); }
  void resize(size_type n) { bits_.resize(n, false); }

  uint64_t serialize(std::ostream& out, structure_tree_node* = nullptr,
                     std::string = "") const {
    uint64_t n = bits_.size();
    out.write(reinterpret_cast<const char*>(&n), sizeof(n));
    uint64_t bytes = sizeof(n);
    for (size_t i = 0; i < bits_.size(); i += 8) {
      uint8_t b = 0;
      for (size_t j = 0; j < 8 && i + j < bits_.size(); ++j)
        if (bits_[i + j]) b = static_cast<uint8_t>(b | (1u << j));
      out.write(reinterpret_cast<const char*>(&b), 1);
      ++bytes;
    }
    return bytes;
  }
  void load(std::istream& in) {
    uint64_t n = 0;
    in.read(reinterpret_cast<char*>(&n), sizeof(n));
    bits_.assign(n, false);
    for (uint64_t i = 0; i < n; i += 8) {
      uint8_t b = 0;
      in.read(reinterpret_cast<char*>(&b), 1);
      for (uint64_t j = 0; j < 8 && i + j < n; ++j)
        bits_[i + j] = (b >> j) & 1u;
    }
  }

 private:
  std::vector<bool> bits_;
};

template <uint8_t t_b = 1, uint8_t t_pat_len = 1>
class rank_support_v {
 public:
  static_assert(t_b == 1, "shim supports rank of ones only");
  rank_support_v() = default;
  explicit rank_support_v(const bit_vector* bv) {
    if (!bv) return;
    for (size_t i = 0; i < bv->size(); ++i)
      if ((*bv)[i]) ones_.push_back(i);
  }
  uint64_t operator()(size_t i) const {
    return static_cast<uint64_t>(
        std::lower_bound(ones_.begin(), ones_.end(), i) - ones_.begin());
  }
  uint64_t serialize(std::ostream& out, structure_tree_node* = nullptr,
                     std::string = "") const {
    return detail::write_u64_vec(ones_, out);
  }
  void load(std::istream& in, const bit_vector* = nullptr) {
    detail::read_u64_vec(ones_, in);
  }

 private:
  std::vector<uint64_t> ones_;
};

// --------------------------------------------------------------------------
// int_vector<W> — width is cosmetic here (values stored as uint64);
// the reference only relies on store/load/index semantics.
// --------------------------------------------------------------------------

template <uint8_t t_width = 64>
class int_vector {
 public:
  typedef size_t size_type;
  typedef uint64_t value_type;

  int_vector() = default;
  explicit int_vector(size_type n, uint64_t def = 0, uint8_t = t_width)
      : data_(n, def) {}

  uint64_t& operator[](size_type i) { return data_[i]; }
  const uint64_t& operator[](size_type i) const { return data_[i]; }
  size_type size() const { return data_.size(); }
  void resize(size_type n) { data_.resize(n, 0); }
  void swap(int_vector& o) { data_.swap(o.data_); }
  uint8_t width() const { return t_width; }

  uint64_t serialize(std::ostream& out, structure_tree_node* = nullptr,
                     std::string = "") const {
    return detail::write_u64_vec(data_, out);
  }
  void load(std::istream& in) { detail::read_u64_vec(data_, in); }

 private:
  std::vector<uint64_t> data_;
};

// --------------------------------------------------------------------------
// rmq_succinct_sct — range-minimum query, inclusive [l, r], returns the
// index of the LEFTMOST minimum. Copies the source values (block minima
// + sparse table over blocks; O(n) memory, O(B) query).
// --------------------------------------------------------------------------

template <bool t_min = true, class t_bp_support = void*>
class rmq_succinct_sct {
  static_assert(t_min, "shim supports min-RMQ only");
  static constexpr size_t kBlock = 32;

 public:
  typedef size_t size_type;

  rmq_succinct_sct() = default;

  template <class Container>
  explicit rmq_succinct_sct(const Container* v) {
    if (!v) return;
    values_.resize(v->size());
    for (size_t i = 0; i < v->size(); ++i)
      values_[i] = static_cast<int64_t>((*v)[i]);
    build();
  }

  // Inclusive range [l, r]; requires l <= r < size.
  size_type operator()(size_type l, size_type r) const {
    size_type bl = l / kBlock, br = r / kBlock;
    if (bl == br) return scan(l, r);
    int64_t best;
    size_type arg = scan(l, (bl + 1) * kBlock - 1);
    best = values_[arg];
    if (br > bl + 1) {
      size_type lev = levels_[br - bl - 1];
      size_type a = table_arg(lev, bl + 1);
      size_type b = table_arg(lev, br - (size_type(1) << lev));
      // overlapping halves: prefer the earlier on ties (leftmost min)
      size_type mid = values_[a] <= values_[b] ? a : b;
      if (values_[mid] < best) {
        best = values_[mid];
        arg = mid;
      }
    }
    size_type tail = scan(br * kBlock, r);
    if (values_[tail] < best) arg = tail;
    return arg;
  }

  uint64_t serialize(std::ostream& out, structure_tree_node* = nullptr,
                     std::string = "") const {
    std::vector<uint64_t> raw(values_.begin(), values_.end());
    return detail::write_u64_vec(raw, out);
  }
  void load(std::istream& in) {
    std::vector<uint64_t> raw;
    detail::read_u64_vec(raw, in);
    values_.assign(raw.begin(), raw.end());
    build();
  }

 private:
  // leftmost argmin by direct scan of [l, r] (within-block work)
  size_type scan(size_type l, size_type r) const {
    size_type arg = l;
    for (size_type i = l + 1; i <= r; ++i)
      if (values_[i] < values_[arg]) arg = i;
    return arg;
  }
  size_type table_arg(size_type lev, size_type blk) const {
    return table_[lev][blk];
  }
  void build() {
    const size_t n = values_.size();
    const size_t nb = (n + kBlock - 1) / kBlock;
    table_.clear();
    levels_.clear();
    if (nb == 0) return;
    table_.emplace_back(nb);
    for (size_t b = 0; b < nb; ++b) {
      size_t lo = b * kBlock, hi = std::min(n - 1, lo + kBlock - 1);
      table_[0][b] = scan(lo, hi);
    }
    for (size_t len = 2; len <= nb; len <<= 1) {
      const auto& prev = table_.back();
      std::vector<size_type> cur(nb - len + 1);
      for (size_t b = 0; b + len <= nb; ++b) {
        size_type a = prev[b], c = prev[b + len / 2];
        cur[b] = values_[a] <= values_[c] ? a : c;  // ties -> leftmost
      }
      table_.push_back(std::move(cur));
    }
    // levels_[k] = floor(log2(k+1)) for interior block spans
    levels_.resize(nb + 1);
    levels_[0] = 0;
    for (size_t k = 1; k <= nb; ++k)
      levels_[k] = levels_[k / 2] + (k >= 2 ? 1 : 0);
  }

  std::vector<int64_t> values_;
  std::vector<std::vector<size_type>> table_;  // argmin per 2^lev blocks
  std::vector<size_type> levels_;
};

}  // namespace sdsl

#endif  // MUMEMTO_SDSL_SHIM_CORE_HPP
