"""swimm_tpu.utils — metrics/timing (L0), synthetic data, misc helpers."""
