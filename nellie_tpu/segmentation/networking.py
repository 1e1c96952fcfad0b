"""Reference-layout alias for nellie_tpu.stages.networking."""
from nellie_tpu.stages.networking import Network  # noqa: F401
