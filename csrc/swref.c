/* swref.c — scalar int32 Gotoh affine-gap Smith-Waterman reference scorer.
 *
 * Test-oracle #2 ("reference C path", BASELINE.json config 1; SURVEY.md
 * section 5 implication 2). Written independently of the NumPy oracle so the
 * two cross-validate each other. Scores only, no traceback.
 *
 * Gap convention: a gap of length k costs gap_open + k*gap_extend (the first
 * gap residue is charged open+extend) — the bit-exactness contract of
 * SURVEY.md section 4.2.
 *
 * Build:  cc -O2 -shared -fPIC -o libswref.so swref.c
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define NEG_INF (INT32_MIN / 4)

static inline int32_t max2(int32_t a, int32_t b) { return a > b ? a : b; }

/* Score one query against one db sequence.
 * submat: row-major (asize x asize) int32. Codes must be < asize. */
int32_t swref_score(const uint8_t *query, int32_t qlen,
                    const uint8_t *db, int32_t dlen,
                    const int32_t *submat, int32_t asize,
                    int32_t gap_open, int32_t gap_extend) {
    int32_t goe = gap_open + gap_extend;
    int32_t best = 0;
    int32_t *H = (int32_t *)calloc((size_t)qlen + 1, sizeof(int32_t));
    int32_t *E = (int32_t *)malloc(((size_t)qlen + 1) * sizeof(int32_t));
    if (!H || !E) { free(H); free(E); return -1; }
    for (int32_t i = 0; i <= qlen; i++) E[i] = NEG_INF;

    for (int32_t j = 0; j < dlen; j++) {
        const int32_t *srow = submat + (size_t)db[j] * asize;
        int32_t h_diag = H[0];       /* H(i-1, j-1) */
        int32_t f = NEG_INF;
        H[0] = 0;
        for (int32_t i = 1; i <= qlen; i++) {
            int32_t e = max2(H[i] - goe, E[i] - gap_extend);
            f = max2(H[i - 1] - goe, f - gap_extend);
            int32_t h = h_diag + srow[query[i - 1]];
            h = max2(h, e);
            h = max2(h, f);
            h = max2(h, 0);
            h_diag = H[i];           /* save old column value before overwrite */
            H[i] = h;
            E[i] = e;
            if (h > best) best = h;
        }
    }
    free(H);
    free(E);
    return best;
}

/* Batch: score one query against n concatenated db sequences.
 * db: concatenated codes; offs[i]/lens[i] locate sequence i; out[i] = score. */
void swref_score_many(const uint8_t *query, int32_t qlen,
                      const uint8_t *db, const int64_t *offs,
                      const int32_t *lens, int32_t n,
                      const int32_t *submat, int32_t asize,
                      int32_t gap_open, int32_t gap_extend,
                      int32_t *out) {
    for (int32_t k = 0; k < n; k++) {
        out[k] = swref_score(query, qlen, db + offs[k], lens[k],
                             submat, asize, gap_open, gap_extend);
    }
}
