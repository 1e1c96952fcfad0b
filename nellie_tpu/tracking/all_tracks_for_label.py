"""Reference-layout alias for nellie_tpu.stages.all_tracks_for_label."""
from nellie_tpu.stages.all_tracks_for_label import LabelTracks  # noqa: F401
