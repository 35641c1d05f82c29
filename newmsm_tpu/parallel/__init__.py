"""Multi-chip / multi-host scale-out (no reference counterpart — newMSM is
single-process OpenMP; SURVEY §2.7).

- group_sharding: subject-sharded groupwise iteration (all_gather + psum)
- pairwise_sharding: CP/face-row-sharded pairwise cost volumes
- multihost: jax.distributed bring-up, hosts-outer subject mesh, per-host
  data slices
"""
from . import group_sharding, multihost, pairwise_sharding  # noqa: F401
