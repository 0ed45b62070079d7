/* End-to-end C consumer of libmumemto_tpu.so (see mumemto_tpu.h).
 * Exercised by tests/test_capi.py: finds multi-MUMs across three mutated
 * copies of a sequence given on stdin (one per line), prints one line per
 * match: "<len>\t<off0>,<off1>,<off2>\t<s0><s1><s2>". */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "mumemto_tpu.h"

int main(void) {
  static char buf[3][1 << 16];
  for (int i = 0; i < 3; ++i) {
    if (fgets(buf[i], sizeof(buf[i]), stdin) == NULL) {
      fprintf(stderr, "need 3 input lines\n");
      return 2;
    }
    buf[i][strcspn(buf[i], "\r\n")] = '\0';
  }
  const char* recs0[] = {buf[0]};
  const char* recs1[] = {buf[1]};
  const char* recs2[] = {buf[2]};
  mumemto_tpu_doc docs[3] = {{recs0, 1}, {recs1, 1}, {recs2, 1}};

  mumemto_tpu_result* r = mumemto_tpu_mum(docs, 3, 20, 1, 0);
  if (r == NULL) {
    fprintf(stderr, "mumemto_tpu_mum failed: %s\n", mumemto_tpu_last_error());
    return 1;
  }
  size_t n = mumemto_tpu_num_matches(r);
  size_t nd = mumemto_tpu_num_docs(r);
  for (size_t i = 0; i < n; ++i) {
    const int64_t* off = mumemto_tpu_match_offsets(r, i);
    const uint8_t* strand = mumemto_tpu_match_strands(r, i);
    printf("%u\t", mumemto_tpu_match_length(r, i));
    for (size_t d = 0; d < nd; ++d)
      printf("%lld%s", (long long)off[d], d + 1 < nd ? "," : "\t");
    for (size_t d = 0; d < nd; ++d) putchar(strand[d] ? '+' : '-');
    putchar('\n');
  }
  mumemto_tpu_free(r);
  return 0;
}
