"""Reference-layout alias for nellie_tpu.stages.mocap_marking."""
from nellie_tpu.stages.mocap_marking import Markers  # noqa: F401
