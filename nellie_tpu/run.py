"""Reference-layout alias: nellie_tpu.run.run == nellie_tpu.pipeline.run.run."""
from nellie_tpu.pipeline.run import run, run_path  # noqa: F401
