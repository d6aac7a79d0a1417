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
