"""Reference-layout alias for nellie_tpu.stages.flow_vector_viz."""
from nellie_tpu.stages.flow_vector_viz import (  # noqa: F401
    flow_vectors_to_tracks,
    load_flow_vector_array,
    load_flow_vectors_as_tracks,
    load_mocap_markers_as_points,
)
