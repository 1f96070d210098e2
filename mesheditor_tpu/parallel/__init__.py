from .sharding import (
    make_mesh,
    shard_element_ops,
    shard_synth,
    shard_elements,
    sharded_pencil_ops,
    batched_render_step,
    sharded_subspace_step,
)

__all__ = [
    "make_mesh",
    "shard_element_ops",
    "shard_synth",
    "shard_elements",
    "sharded_pencil_ops",
    "batched_render_step",
    "sharded_subspace_step",
]
