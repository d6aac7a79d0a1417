"""swimm_tpu.models — the search pipeline (L4) and result reduction (L0)."""
