"""swimm_tpu.parallel — device mesh, sharded search, collective top-k (L3).

Replaces the reference's heterogeneous offload scheduler (component C12,
SURVEY.md sections 3 and 4.3): instead of streaming DB chunks over PCIe to
coprocessors with dynamic load balancing, the database lives sharded in HBM
across the chips of a slice (ICI) / hosts of a pod (DCN), query profiles are
replicated, and per-shard top-k candidate lists are merged with all_gather
collectives (SURVEY.md section 6.8).
"""
