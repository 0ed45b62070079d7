/* gsacak.h — shim header, written from scratch for mumemto_tpu.
 *
 * Declares the subset of the gsa-is API (Louza, Gog, Telles,
 * "Inducing enhanced suffix arrays for string collections", TCS 2017)
 * that the reference consumes:
 *   - dictionary.hpp:133  gsacak(&d[0], &saD[0], &lcpD[0], nullptr, n)
 *   - direct_gsacak.hpp:62 gsacak(&text[0], &sa[0], &lcp[0], nullptr, n)
 *   - parse.hpp:85        sacak_int(&p[0], &saP[0], p.size(), alphabet_size)
 *
 * Types mirror the published gsa-is contract: under -DM64 the index
 * types are 64-bit; the integer-alphabet text type (int_text) is
 * uint32_t (pinned by parse.hpp's std::vector<uint32_t> p).
 *
 * The implementation (gsacak_shim.cc) is an independent SA-IS +
 * Kasai formulation of the same mathematical contract — NOT a copy of
 * gsa-is.  Semantics implemented:
 *   - input s[0..n-1] with s[n-1] == 0, the unique global terminator
 *     (smallest symbol);
 *   - every occurrence of symbol 1 is a string separator; separators
 *     compare below all regular symbols (>= 2) and pairwise by text
 *     position (earlier separator < later separator), which is the
 *     generalized-suffix-array order of the paper;
 *   - SA[0..n-1] is the suffix array under that order;
 *   - LCP[i] is the longest common prefix of SA[i-1]/SA[i] suffixes,
 *     where a separator matches nothing (in particular two separator
 *     suffixes have LCP 0); LCP[0] = 0;
 *   - DA output is not supported (the reference always passes nullptr).
 */
#ifndef GSACAK_SHIM_H
#define GSACAK_SHIM_H

#include <stdint.h>

#ifdef M64
typedef int64_t int_t;
typedef uint64_t uint_t;
#define PRIdN PRId64
#define U_MAX UINT64_MAX
#define I_MAX INT64_MAX
#define I_MIN INT64_MIN
#else
typedef int32_t int_t;
typedef uint32_t uint_t;
#define PRIdN PRId32
#define U_MAX UINT32_MAX
#define I_MAX INT32_MAX
#define I_MIN INT32_MIN
#endif

/* integer-alphabet text symbol (always 32-bit in gsa-is) */
typedef uint32_t int_text;

/* document-array entry type; the reference also uses it as a generic
 * signed index for dictionary suffix numbers (pfp_lcp_mum.hpp:241),
 * so under M64 it must hold 64-bit values */
#ifdef M64
typedef int64_t int_da;
#else
typedef int32_t int_da;
#endif

#ifdef __cplusplus
extern "C" {
#endif

/* suffix array (and optional LCP/DA) of a byte collection with
 * 1-separators and 0-terminator; returns 0 on success */
int gsacak(unsigned char *s, uint_t *SA, int_t *LCP, int_t *DA, uint_t n);

/* plain suffix array of a byte string terminated by 0 */
int sacak(unsigned char *s, uint_t *SA, uint_t n);

/* plain suffix array of an integer string terminated by 0;
 * k is an upper bound on the alphabet size */
int sacak_int(int_text *s, uint_t *SA, uint_t n, uint_t k);

#ifdef __cplusplus
}
#endif

#endif /* GSACAK_SHIM_H */
