"""Reference-layout alias for nellie_tpu.stages.hierarchical."""
from nellie_tpu.stages.hierarchical import (  # noqa: F401
    Hierarchy,
    border_distance,
)
