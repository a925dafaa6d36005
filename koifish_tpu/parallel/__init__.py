from koifish_tpu.parallel.mesh import make_mesh, mesh_shape_for  # noqa: F401
from koifish_tpu.parallel.sharding import (  # noqa: F401
    param_specs, shard_params, batch_spec, constrain_activations,
)
from koifish_tpu.parallel.planner import (  # noqa: F401
    MemoryPlan, plan_serving, plan_training)
