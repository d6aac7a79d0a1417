"""Actual >= 2-process jax.distributed execution (VERDICT r1 #1).

Runs benchmarks/multiproc_smoke.py as a subprocess: 2 OS processes x 4
virtual CPU devices each form one global mesh; each host assembles only its
own DB shards (global_tile_shards / make_global_chunk) and the production
sharded_search runs with cross-process Gloo collectives. Hit lists must be
bit-exact vs the serial driver on EVERY process.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_two_process_distributed_search():
    p = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "multiproc_smoke.py"),
         "--n-procs", "2", "--n-seqs", "200"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO))
    assert p.returncode == 0, f"stdout:\n{p.stdout}\nstderr:\n{p.stderr[-3000:]}"
    assert '"multiproc_smoke": "PASS"' in p.stdout
