"""Reference-layout alias for nellie_tpu.stages.labelling."""
from nellie_tpu.stages.labelling import Label  # noqa: F401
