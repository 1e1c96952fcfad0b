"""Reference-layout alias for the CLI."""
from nellie_tpu.pipeline.cli import main, process_directory, process_files  # noqa: F401

if __name__ == "__main__":
    main()
