"""Reference-layout alias for nellie_tpu.stages.voxel_reassignment."""
from nellie_tpu.stages.voxel_reassignment import VoxelReassigner  # noqa: F401
