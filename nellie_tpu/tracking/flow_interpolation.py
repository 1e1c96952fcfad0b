"""Reference-layout alias for nellie_tpu.stages.flow_interpolation."""
from nellie_tpu.stages.flow_interpolation import (  # noqa: F401
    FlowInterpolator,
    interpolate_all_backward,
    interpolate_all_forward,
)
