from apex_studio_tpu.parallel.mesh import create_mesh, get_mesh, set_mesh, mesh_axes  # noqa: F401
from apex_studio_tpu.parallel.sharding import (  # noqa: F401
    ShardingRules,
    shard_pytree,
    partition_specs_for,
    constrain,
)
