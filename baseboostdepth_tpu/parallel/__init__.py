"""Device-mesh parallelism.

The reference trains on exactly one GPU (trainer.py:43; SURVEY.md 2.10: no
DDP/NCCL of any kind). Here data parallelism over a TPU slice is first-class:
jit + NamedSharding over a 1-D 'data' mesh, params replicated, batch sharded.
Gradient/BatchNorm reductions become ICI psums inserted by GSPMD -- i.e.
sync-BN and gradient all-reduce come out of the partitioner, not hand-written
collectives. Multi-host extends the same mesh via jax.distributed.initialize.
"""

from baseboostdepth_tpu.parallel.sharding import (  # noqa: F401
    data_mesh,
    initialize_distributed,
    shard_batch,
    replicate,
)
