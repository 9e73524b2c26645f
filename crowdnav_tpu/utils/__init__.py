"""Host-side utilities: episode CSV logs, checkpointing, YAML config,
profiling/tracing."""

from crowdnav_tpu.utils.logging import EpisodeLogger  # noqa: F401
from crowdnav_tpu.utils.checkpoint import (  # noqa: F401
    load_run_metadata,
    restore_checkpoint,
    save_checkpoint,
    save_run_metadata,
)
from crowdnav_tpu.utils.yaml_config import load_yaml_config  # noqa: F401
from crowdnav_tpu.utils.profiling import (  # noqa: F401
    StepThroughput,
    annotate,
    trace,
    trace_if,
)
