"""Shared build-and-cache helper for the native C components.

One place for the compile/mtime/reload logic used by swimm_tpu.native and
ops.cref. The compile writes to a temp file and os.rename()s it into place
so concurrent processes (e.g. parallel test workers) never dlopen a
half-written shared object.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path


def load_or_build(src: Path, lib: Path) -> ctypes.CDLL:
    """Return a CDLL for `lib`, (re)compiling from `src` if missing/stale."""
    if not lib.exists() or lib.stat().st_mtime < src.stat().st_mtime:
        cc = os.environ.get("CC", "cc")
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=str(lib.parent))
        os.close(fd)
        try:
            subprocess.run([cc, "-O2", "-shared", "-fPIC", "-o", tmp,
                            str(src)], check=True, capture_output=True)
            os.replace(tmp, lib)     # atomic within the same directory
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return ctypes.CDLL(str(lib))
