"""Device mesh + sharding: the scale-out layer the reference never had.

The reference is single-device by construction (MLX unified memory,
SURVEY.md §2 "parallelism strategies: none"). Here sharding is first-class:
the same model code runs on one chip or a ``jax.sharding.Mesh`` of many,
with XLA inserting the ICI collectives (SURVEY.md §2 "TPU-native
equivalents"). Axes:

- ``dp`` — data parallel: batch of concurrent streams (serving) or examples
  (training) split across chips;
- ``tp`` — tensor parallel: attention heads and FFN width split across
  chips, collectives (psum on o/down projections) ride ICI;
- ``pp`` — pipeline parallel (training): the talker's stacked layers split
  into stages, microbatch activations rotate with collective permute
  (``parallel.pipeline``; manual over pp only, dp/tp stay GSPMD-auto).

Sequence parallelism is a train-step option (``make_train_step(...,
sequence_parallel=True)``): the residual stream shards along T over tp
between blocks via sharding constraints. Expert parallelism is N/A by
design — Qwen3-TTS has no mixture-of-experts layers anywhere
(talker/code-predictor/codec are all dense).

No NCCL/MPI analogue exists or is needed: placement is expressed with
``NamedSharding`` and ``jax.jit`` compiles in the communication.
"""

from .mesh import MeshPlan, build_mesh, local_mesh  # noqa: F401
from .pipeline import pipeline_stack, talker_stack_fn  # noqa: F401
from .sharding import (  # noqa: F401
    cache_sharding,
    shard_model,
    shard_params,
    talker_param_spec,
)
