"""Multi-chip parallelism: device meshes, sharding rules, sharded steps."""

from larynx_tpu.parallel.mesh import (  # noqa: F401
    batch_spec,
    glow_param_specs,
    make_mesh,
    replicated_spec,
)
from larynx_tpu.parallel.train import (  # noqa: F401
    TrainState,
    make_train_step,
    noam_schedule,
)
from larynx_tpu.parallel.serve import make_sharded_synthesis  # noqa: F401
