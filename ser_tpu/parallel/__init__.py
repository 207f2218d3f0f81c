"""Device mesh + data/tensor-parallel sharding."""

from ser_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate_params,
    shard_batch,
)
from ser_tpu.parallel.tp import (  # noqa: F401
    make_mesh_2d,
    shard_batch_2d,
    shard_params,
)
