// gsacak_shim.cc — from-scratch implementation of the gsa-is API subset
// declared in gsacak.h, used to link the UNMODIFIED reference sources
// (/root/reference) into a runnable oracle binary for golden testing.
//
// Not a copy of gsa-is: the generalized suffix array is obtained by
// remapping every separator occurrence (symbol 1) to a distinct integer
// ranked by text position — which reproduces the paper's suffix order
// ($_i < $_j iff i < j, all separators below regular symbols) — and then
// running a plain 64-bit SA-IS + Kasai pass over the remapped integer
// string. Because remapped separators are pairwise distinct, Kasai's
// LCP automatically stops at separators, matching the gSACAK LCP
// definition.
//
// This file is TEST INFRASTRUCTURE (like oracle/naive.py): it is not on
// any product path of mumemto_tpu.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <algorithm>

#include "gsacak.h"

namespace {

// SA-IS induced sorting over an int64 alphabet [0, K); s[n-1] must be
// the unique smallest sentinel. Same published algorithm as
// native/baseline_cpu.cc's 32-bit version, re-templated for 64-bit
// index/symbol types (the reference builds with -DM64).
template <typename CharT>
void sais64(const CharT* s, int64_t* sa, int64_t n, int64_t K) {
  if (n == 0) return;
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  std::vector<bool> is_s(n);
  is_s[n - 1] = true;
  for (int64_t i = n - 2; i >= 0; --i)
    is_s[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && is_s[i + 1]);
  auto is_lms = [&](int64_t i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

  std::vector<int64_t> bkt(K);
  auto fill_buckets = [&](bool ends) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (int64_t i = 0; i < n; ++i) ++bkt[s[i]];
    int64_t sum = 0;
    for (int64_t c = 0; c < K; ++c) {
      sum += bkt[c];
      bkt[c] = ends ? sum : sum - bkt[c];
    }
  };

  auto induce = [&]() {
    fill_buckets(false);
    for (int64_t i = 0; i < n; ++i) {
      int64_t j = sa[i];
      if (j > 0 && !is_s[j - 1]) sa[bkt[s[j - 1]]++] = j - 1;
    }
    fill_buckets(true);
    for (int64_t i = n - 1; i >= 0; --i) {
      int64_t j = sa[i];
      if (j > 0 && is_s[j - 1]) sa[--bkt[s[j - 1]]] = j - 1;
    }
  };

  std::fill(sa, sa + n, int64_t{-1});
  fill_buckets(true);
  for (int64_t i = 1; i < n; ++i)
    if (is_lms(i)) sa[--bkt[s[i]]] = i;
  induce();

  int64_t n1 = 0;
  for (int64_t i = 0; i < n; ++i)
    if (is_lms(sa[i])) sa[n1++] = sa[i];

  std::fill(sa + n1, sa + n, int64_t{-1});
  int64_t name = 0;
  int64_t prev = -1;
  for (int64_t i = 0; i < n1; ++i) {
    int64_t pos = sa[i];
    bool diff = false;
    if (prev < 0) {
      diff = true;
    } else {
      for (int64_t d = 0; d < n; ++d) {
        if (s[pos + d] != s[prev + d] || is_s[pos + d] != is_s[prev + d]) {
          diff = true;
          break;
        }
        if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) break;
      }
    }
    if (diff) {
      ++name;
      prev = pos;
    }
    sa[n1 + pos / 2] = name - 1;
  }
  for (int64_t i = n - 1, j = n - 1; i >= n1; --i)
    if (sa[i] >= 0) sa[j--] = sa[i];

  int64_t* s1 = sa + n - n1;
  if (name < n1) {
    sais64<int64_t>(s1, sa, n1, name);
  } else {
    for (int64_t i = 0; i < n1; ++i) sa[s1[i]] = i;
  }

  for (int64_t i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) s1[j++] = i;
  for (int64_t i = 0; i < n1; ++i) sa[i] = s1[sa[i]];
  std::fill(sa + n1, sa + n, int64_t{-1});
  fill_buckets(true);
  for (int64_t i = n1 - 1; i >= 0; --i) {
    int64_t j = sa[i];
    sa[i] = -1;
    sa[--bkt[s[j]]] = j;
  }
  induce();
}

// Kasai LCP over the (remapped) integer string.
void kasai64(const int64_t* s, const int64_t* sa, int64_t* lcp, int64_t n) {
  std::vector<int64_t> isa(n);
  for (int64_t r = 0; r < n; ++r) isa[sa[r]] = r;
  int64_t h = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = isa[i];
    if (r > 0) {
      int64_t j = sa[r - 1];
      while (i + h < n && j + h < n && s[i + h] == s[j + h]) ++h;
      lcp[r] = h;
      if (h) --h;
    } else {
      lcp[r] = 0;
      h = 0;
    }
  }
}

}  // namespace

extern "C" int gsacak(unsigned char* s, uint_t* SA, int_t* LCP, int_t* DA,
                      uint_t n) {
  if (DA != nullptr) {
    std::fprintf(stderr, "gsacak shim: DA output not supported\n");
    std::abort();
  }
  const int64_t N = static_cast<int64_t>(n);
  if (N == 0) return 0;
  if (s[N - 1] != 0) {
    std::fprintf(stderr, "gsacak shim: input must end with terminator 0\n");
    std::abort();
  }
  // Remap: terminator 0 -> 0; the i-th separator (symbol 1, by text
  // position, 1-based) -> i; regular symbol c >= 2 -> c + m - 1 where m
  // is the separator count. Order within each class and between classes
  // matches the gSA convention; all remapped symbols are distinct from
  // separators, so LCP never crosses one.
  int64_t m = 0;
  for (int64_t i = 0; i < N; ++i)
    if (s[i] == 1) ++m;
  std::vector<int64_t> t(N);
  int64_t sep_rank = 0;
  for (int64_t i = 0; i < N; ++i) {
    const unsigned char c = s[i];
    if (c == 0) {
      if (i != N - 1) {
        std::fprintf(stderr, "gsacak shim: interior terminator at %lld\n",
                     static_cast<long long>(i));
        std::abort();
      }
      t[i] = 0;
    } else if (c == 1) {
      t[i] = ++sep_rank;
    } else {
      t[i] = static_cast<int64_t>(c) + m - 1;
    }
  }
  std::vector<int64_t> sa(N);
  sais64<int64_t>(t.data(), sa.data(), N, 255 + m);
  if (LCP != nullptr) {
    std::vector<int64_t> lcp(N);
    kasai64(t.data(), sa.data(), lcp.data(), N);
    for (int64_t i = 0; i < N; ++i) LCP[i] = static_cast<int_t>(lcp[i]);
  }
  for (int64_t i = 0; i < N; ++i) SA[i] = static_cast<uint_t>(sa[i]);
  return 0;
}

extern "C" int sacak(unsigned char* s, uint_t* SA, uint_t n) {
  const int64_t N = static_cast<int64_t>(n);
  if (N == 0) return 0;
  std::vector<int64_t> t(s, s + N);
  std::vector<int64_t> sa(N);
  sais64<int64_t>(t.data(), sa.data(), N, 256);
  for (int64_t i = 0; i < N; ++i) SA[i] = static_cast<uint_t>(sa[i]);
  return 0;
}

extern "C" int sacak_int(int_text* s, uint_t* SA, uint_t n, uint_t k) {
  const int64_t N = static_cast<int64_t>(n);
  if (N == 0) return 0;
  if (s[N - 1] != 0) {
    std::fprintf(stderr, "sacak_int shim: input must end with 0\n");
    std::abort();
  }
  std::vector<int64_t> t(s, s + N);
  int64_t K = static_cast<int64_t>(k);
  for (int64_t i = 0; i < N; ++i) K = std::max(K, t[i] + 1);
  std::vector<int64_t> sa(N);
  sais64<int64_t>(t.data(), sa.data(), N, K);
  for (int64_t i = 0; i < N; ++i) SA[i] = static_cast<uint_t>(sa[i]);
  return 0;
}
