"""Reference-layout alias for nellie_tpu.stages.hu_tracking."""
from nellie_tpu.stages.hu_tracking import HuMomentTracking  # noqa: F401
