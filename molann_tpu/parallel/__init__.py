from .mesh import data_mesh, batch_sharding, replicated_sharding
from .data_parallel import (
    make_data_parallel_fn,
    shard_batch,
    psum_mean_grads,
)

__all__ = [
    "data_mesh",
    "batch_sharding",
    "replicated_sharding",
    "make_data_parallel_fn",
    "shard_batch",
    "psum_mean_grads",
]

from .multihost import (  # noqa: E402
    global_batch,
    initialize_multihost,
    process_local_slice,
)

__all__ += [
    "initialize_multihost",
    "global_batch",
    "process_local_slice",
]
