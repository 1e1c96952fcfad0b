"""Reference-layout alias for nellie_tpu.stages.filtering."""
from nellie_tpu.stages.filtering import Filter  # noqa: F401
