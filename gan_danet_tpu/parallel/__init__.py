"""Parallelism surface (SURVEY.md §2.10).

The reference is single-GPU: its only "parallelism" is a sequential Python
loop over 5 ensemble members (deep_ensemble.ipynb:322-340). Here the
scaling axes are first-class:

  * `make_mesh(n_ensemble, n_data)` — 2-D ('ensemble', 'data') device mesh
  * data parallelism  — batches shard over 'data'; the gradient allreduce
    is inserted by XLA from sharding annotations and rides ICI
  * ensemble parallelism — member-stacked params shard over 'ensemble'
    (lax.scan over local members inside shard_map), training all deep-
    ensemble members simultaneously
  * bf16 compute with f32 params/BN stats (models' `dtype` knobs)

See parallel/spmd.py for the shard_map-wrapped ensemble train step and
__graft_entry__.dryrun_multichip for the executable multi-chip example.
"""
from gan_danet_tpu.core.meshes import (  # noqa: F401
    DATA_AXIS,
    ENSEMBLE_AXIS,
    batch_sharding,
    ensemble_batch_sharding,
    ensemble_sharding,
    make_mesh,
    replicated,
)
from gan_danet_tpu.parallel.spmd import make_ensemble_step  # noqa: F401
