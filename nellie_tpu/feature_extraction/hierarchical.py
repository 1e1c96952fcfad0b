"""Reference-layout alias for nellie_tpu.stages.hierarchical."""
from nellie_tpu.stages.hierarchical import (  # noqa: F401
    Branches,
    Components,
    Hierarchy,
    Image,
    Nodes,
    Voxels,
    aggregate_stats_for_class,
    append_to_array,
    distance_check,
)
