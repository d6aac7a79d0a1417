"""Sanitizer build of the native C components (SURVEY.md 6.2).

The reference avoided data races structurally (per-thread buffers); our
native code is single-threaded C called via ctypes. This test compiles the
C oracle standalone under ASan+UBSan, feeds it randomized batches over a
pipe, and cross-checks scores against the NumPy oracle — memory errors or
UB abort the executable and fail the test.
"""

import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from swimm_tpu.matrices import get_matrix
from swimm_tpu.ops import reference
from swimm_tpu.utils.synth import random_codes

CSRC = Path(__file__).resolve().parents[1] / "csrc" / "swref.c"

MAIN = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
extern void swref_score_many(const unsigned char*, int,
                             const unsigned char*, const long long*,
                             const int*, int, const int*, int, int, int,
                             int*);
int main(void) {
    int hdr[5];
    if (fread(hdr, sizeof(int), 5, stdin) != 5) return 2;
    int m = hdr[0], n = hdr[1], go = hdr[2], ge = hdr[3], asize = hdr[4];
    unsigned char *q = malloc(m);
    fread(q, 1, m, stdin);
    int *lens = malloc(n * sizeof(int));
    fread(lens, sizeof(int), n, stdin);
    long long total = 0, *offs = malloc(n * sizeof(long long));
    for (int i = 0; i < n; i++) { offs[i] = total; total += lens[i]; }
    unsigned char *blob = malloc(total ? total : 1);
    fread(blob, 1, total, stdin);
    int *sub = malloc(asize * asize * sizeof(int));
    fread(sub, sizeof(int), asize * asize, stdin);
    int *out = malloc(n * sizeof(int));
    swref_score_many(q, m, blob, offs, lens, n, sub, asize, go, ge, out);
    fwrite(out, sizeof(int), n, stdout);
    free(q); free(lens); free(offs); free(blob); free(sub); free(out);
    return 0;
}
"""


@pytest.mark.skipif(shutil.which("cc") is None, reason="no C compiler")
def test_swref_under_asan(tmp_path):
    main_c = tmp_path / "main.c"
    main_c.write_text(MAIN)
    exe = tmp_path / "swref_asan"
    r = subprocess.run(
        ["cc", "-O1", "-g", "-fsanitize=address,undefined",
         "-fno-sanitize-recover=all", "-o", str(exe), str(CSRC),
         str(main_c)],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"asan toolchain unavailable: {r.stderr[-200:]}")

    rng = np.random.default_rng(7)
    sub = get_matrix("BLOSUM62")
    q = random_codes(rng, 61)
    seqs = [random_codes(rng, int(rng.integers(1, 120))) for _ in range(40)]
    lens = np.array([len(s) for s in seqs], np.int32)
    blob = np.concatenate(seqs).astype(np.uint8)
    payload = (struct.pack("5i", len(q), len(seqs), 10, 2, sub.shape[0])
               + q.astype(np.uint8).tobytes() + lens.tobytes()
               + blob.tobytes()
               + np.ascontiguousarray(sub, np.int32).tobytes())
    r = subprocess.run([str(exe)], input=payload, capture_output=True,
                       timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    got = np.frombuffer(r.stdout, np.int32)
    exp = reference.sw_score_many(q, seqs, sub, 10, 2)
    assert np.array_equal(got, exp)


PACK_MAIN = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
typedef struct {
    unsigned char *codes; long long total_residues;
    int *lengths; long long n_seqs;
    long long *tit_offs; char *titles; long long titles_len;
} fasta_data;
extern int swpack_parse_fasta(const char*, const unsigned char*, fasta_data*);
extern void swpack_free(fasta_data*);
extern void swpack_fill_chunk(const unsigned char*, const long long*,
                              const int*, const long long*, long long,
                              int, int, signed char, signed char*, long long);
int main(int argc, char **argv) {
    unsigned char lut[256];
    for (int i = 0; i < 256; i++) lut[i] = 22;   /* X */
    for (int i = 0; i < 26; i++) lut['A' + i] = (unsigned char)(i % 24);
    fasta_data d;
    if (swpack_parse_fasta(argv[1], lut, &d) != 0) return 2;
    printf("n=%lld res=%lld titles=%lld first=%c\n", d.n_seqs,
           d.total_residues, d.titles_len,
           d.titles_len ? d.titles[0] : '-');
    if (d.n_seqs > 0) {
        long long *offs = malloc(d.n_seqs * sizeof(long long));
        long long *order = malloc(d.n_seqs * sizeof(long long));
        long long tot = 0;
        int maxlen = 1;
        for (long long i = 0; i < d.n_seqs; i++) {
            offs[i] = tot; tot += d.lengths[i]; order[i] = i;
            if (d.lengths[i] > maxlen) maxlen = d.lengths[i];
        }
        int L = ((maxlen + 31) / 32) * 32, V = 4;
        long long nb = (d.n_seqs + V - 1) / V;
        signed char *out = malloc(nb * L * V);
        swpack_fill_chunk(d.codes, offs, d.lengths, order, d.n_seqs,
                          L, V, -1, out, nb * (long long)L * V);
        long long sum = 0;
        for (long long i = 0; i < nb * (long long)L * V; i++) sum += out[i];
        printf("packsum=%lld\n", sum);
        free(offs); free(order); free(out);
    }
    swpack_free(&d);
    return 0;
}
"""

PACK_CSRC = Path(__file__).resolve().parents[1] / "csrc" / "swpack.c"


@pytest.mark.skipif(shutil.which("cc") is None, reason="no C compiler")
def test_swpack_under_asan(tmp_path):
    main_c = tmp_path / "main.c"
    main_c.write_text(PACK_MAIN)
    exe = tmp_path / "swpack_asan"
    r = subprocess.run(
        ["cc", "-O1", "-g", "-fsanitize=address,undefined",
         "-fno-sanitize-recover=all", "-o", str(exe), str(PACK_CSRC),
         str(main_c)],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"asan toolchain unavailable: {r.stderr[-200:]}")

    # normal file, a title that exactly fills the 4096-byte first capacity
    # (the historical heap-overread case), odd whitespace, and empty file
    cases = {
        "normal.fasta": ">s1 alpha\nMKVLA\nTRES\n>s2\nARN DCE\n",
        "bigtitle.fasta": ">" + "T" * 4095 + "\nMKV\n",
        "headers_only.fasta": ">a\n>b\n>c\n",
        "empty.fasta": "",
    }
    for name, content in cases.items():
        fa = tmp_path / name
        fa.write_text(content)
        r = subprocess.run([str(exe), str(fa)], capture_output=True,
                           timeout=60)
        assert r.returncode == 0, (name, r.stderr[-500:])
    # parity: native parse matches the Python parser on the normal file
    from swimm_tpu import native
    from swimm_tpu.fasta import read_fasta
    if native.available():
        fa = tmp_path / "normal.fasta"
        codes, offs, lens, titles = native.parse_fasta(fa)
        recs = read_fasta(fa)
        assert titles == [rec.title for rec in recs]
        assert list(lens) == [rec.length for rec in recs]
        for i, rec in enumerate(recs):
            assert np.array_equal(codes[offs[i]:offs[i] + lens[i]],
                                  rec.codes)
