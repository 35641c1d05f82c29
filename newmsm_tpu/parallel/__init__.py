"""Multi-chip / multi-host scale-out (no reference counterpart — newMSM is
single-process OpenMP; SURVEY §2.7).

- group_fusion: THE production subject-sharded groupwise fusion optimiser
  (reg/group.py drives it for any device count)
- pairwise_sharding: CP/face-row-sharded pairwise cost volumes
- multihost: jax.distributed bring-up, hosts-outer subject mesh, per-host
  data slices
"""
from . import group_fusion, multihost, pairwise_sharding  # noqa: F401
