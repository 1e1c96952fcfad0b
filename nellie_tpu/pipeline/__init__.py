"""Pipeline orchestration: run() and the CLI."""

from nellie_tpu.pipeline.run import run  # noqa: F401
