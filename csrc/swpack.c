/* swpack.c — native data layer: streaming FASTA parse/encode + block pack.
 *
 * Reference parity: components C2 (FASTA parser + residue encoder) and the
 * hot part of C3 (block packing) are C in the reference engine (SURVEY.md
 * section 3); this is their native implementation here. The residue
 * encoding LUT is PASSED IN from Python (swimm_tpu/alphabet.py) so the two
 * encoders cannot drift.
 *
 * Build:  cc -O2 -shared -fPIC -o libswpack.so swpack.c
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    uint8_t *codes;        /* concatenated residue codes                */
    int64_t total_residues;
    int32_t *lengths;      /* per sequence                              */
    int64_t n_seqs;
    int64_t *tit_offs;     /* n_seqs+1 offsets into titles              */
    char *titles;          /* concatenated title strings (no '>')       */
    int64_t titles_len;
} fasta_data;

static int grow(void **buf, int64_t *cap, int64_t need, size_t elt) {
    if (need <= *cap) return 0;
    int64_t ncap = *cap ? *cap : 4096;
    while (ncap < need) ncap *= 2;
    void *nb = realloc(*buf, (size_t)ncap * elt);
    if (!nb) return -1;
    *buf = nb;
    *cap = ncap;
    return 0;
}

void swpack_free(fasta_data *d) {
    free(d->codes); free(d->lengths); free(d->tit_offs); free(d->titles);
    memset(d, 0, sizeof(*d));
}

/* Parse a FASTA file. lut: 256-entry residue->code map (values >= 0; the
 * caller maps unknowns to its ambiguity code). Returns 0 on success. */
int swpack_parse_fasta(const char *path, const uint8_t *lut, fasta_data *out) {
    memset(out, 0, sizeof(*out));
    FILE *f = fopen(path, "rb");
    if (!f) return -1;

    int64_t codes_cap = 0, len_cap = 0, tit_cap = 0, toff_cap = 0;
    int64_t cur_len = 0;
    int in_title = 0, have_seq = 0;
    char *line = NULL;
    size_t lcap = 0;
    ssize_t n;

    while ((n = getline(&line, &lcap, f)) >= 0) {
        if (n > 0 && line[n - 1] == '\n') line[--n] = 0;
        if (n > 0 && line[n - 1] == '\r') line[--n] = 0;
        if (n == 0) continue;
        if (line[0] == '>') {
            if (have_seq) {
                if (grow((void **)&out->lengths, &len_cap, out->n_seqs + 1,
                         sizeof(int32_t))) goto fail;
                out->lengths[out->n_seqs++] = (int32_t)cur_len;
            }
            have_seq = 1;
            cur_len = 0;
            /* title (strip '>' and surrounding whitespace, both ends —
             * must match the Python parser's .strip()) */
            char *t = line + 1;
            while (*t == ' ' || *t == '\t') t++;
            size_t tl = strlen(t);
            while (tl > 0 && (t[tl - 1] == ' ' || t[tl - 1] == '\t'))
                tl--;
            if (grow((void **)&out->tit_offs, &toff_cap, out->n_seqs + 1,
                     sizeof(int64_t))) goto fail;
            out->tit_offs[out->n_seqs] = out->titles_len;
            if (grow((void **)&out->titles, &tit_cap,
                     out->titles_len + (int64_t)tl + 1, 1)) goto fail;
            memcpy(out->titles + out->titles_len, t, tl);
            out->titles_len += (int64_t)tl;
            out->titles[out->titles_len++] = '\n';
            (void)in_title;
        } else {
            if (!have_seq) goto fail;   /* data before first header */
            if (grow((void **)&out->codes, &codes_cap,
                     out->total_residues + n, 1)) goto fail;
            uint8_t *dst = out->codes + out->total_residues;
            for (ssize_t i = 0; i < n; i++) {
                unsigned char c = (unsigned char)line[i];
                if (c == ' ' || c == '\t') continue;
                *dst++ = lut[c];
            }
            int64_t added = dst - (out->codes + out->total_residues);
            out->total_residues += added;
            cur_len += added;
        }
    }
    if (have_seq) {
        if (grow((void **)&out->lengths, &len_cap, out->n_seqs + 1,
                 sizeof(int32_t))) goto fail;
        out->lengths[out->n_seqs++] = (int32_t)cur_len;
    }
    if (grow((void **)&out->tit_offs, &toff_cap, out->n_seqs + 1,
             sizeof(int64_t))) goto fail;
    out->tit_offs[out->n_seqs] = out->titles_len;
    /* NUL-terminate the titles blob: the Python side receives it as a
     * C string pointer, and without this a blob that exactly fills its
     * capacity would be read past the allocation. */
    if (grow((void **)&out->titles, &tit_cap, out->titles_len + 1, 1))
        goto fail;
    out->titles[out->titles_len] = 0;
    free(line);
    fclose(f);
    return 0;
fail:
    free(line);
    fclose(f);
    swpack_free(out);
    return -2;
}

/* Pack n sorted sequences into a rectangular (nb, L, V) int8 chunk.
 * codes: concatenated residue blob; offs/lens: per ORIGINAL sequence;
 * order: the n original indices in packing order; out prefilled by caller
 * or filled here with pad. */
void swpack_fill_chunk(const uint8_t *codes, const int64_t *offs,
                       const int32_t *lens, const int64_t *order,
                       int64_t n, int32_t L, int32_t V, int8_t pad,
                       int8_t *out, int64_t out_elems) {
    memset(out, (unsigned char)pad, (size_t)out_elems);
    for (int64_t k = 0; k < n; k++) {
        int64_t blk = k / V, lane = k % V;
        const uint8_t *src = codes + offs[order[k]];
        int32_t len = lens[order[k]];
        int8_t *base = out + blk * (int64_t)L * V + lane;
        for (int32_t j = 0; j < len; j++)
            base[(int64_t)j * V] = (int8_t)src[j];
    }
}
