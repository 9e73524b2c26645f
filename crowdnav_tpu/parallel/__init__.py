"""Runtime: jitted actor-learner loops, device meshes, sharded training."""

from crowdnav_tpu.parallel.runtime import (  # noqa: F401
    Trainer,
    TrainerConfig,
    TrainerState,
)
from crowdnav_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    ShardedTrainer,
)
from crowdnav_tpu.parallel.distributed import (  # noqa: F401
    init_multihost,
    distribute,
    process_summary,
)
