"""swimm_tpu.ops — scoring kernels (L2) and CPU oracles.

- reference.py     pure-NumPy O(mn) Gotoh oracle (test oracle #1)
- cref.py          ctypes wrapper over csrc/swref.c (test oracle #2, the
                   "reference C path" required by BASELINE config 1)
- xla_scorer.py    portable vectorized lax.scan scorer (exact int32)
- pallas_scorer.py Pallas TPU kernel (VMEM-resident DP state)
- ladder.py        adaptive-precision recheck driver (SURVEY.md section 4.4)
"""
