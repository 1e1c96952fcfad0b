"""Batch CLI for the nellie_tpu pipeline.

Rebuild of the reference CLI (``/root/reference/nellie/cli.py``), with
its bitrot fixed: the reference passes kwargs that ``run()`` no longer
accepts (``cli.py:10`` vs ``run.py:18-26``); here channel/time selection
goes through FileInfo as the pipeline expects.
"""
from __future__ import annotations

import argparse
import os

from nellie_tpu.pipeline.run import run_path


def process_files(files, ch, num_t, output_dir, **kwargs):
    for file_num, tif_file in enumerate(files):
        print(f"Processing file {file_num + 1} of {len(files)}, channel {ch}")
        try:
            run_path(
                tif_file, ch=ch,
                t_end=(num_t - 1 if num_t is not None else None),
                output_dir=output_dir, **kwargs,
            )
        except Exception as exc:  # noqa: BLE001 - batch robustness
            print(f"Failed to run {tif_file}: {exc}")
            continue


def process_directory(directory, substring, output_dir, ch, num_t, **kwargs):
    all_files = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if substring in f and (f.endswith(".tiff") or f.endswith(".tif"))
    )
    process_files(all_files, ch, num_t, output_dir, **kwargs)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Process TIFF images in a directory with the nellie_tpu pipeline.")
    parser.add_argument("--directory", required=True, help="Directory with TIFF files")
    parser.add_argument("--substring", default="", help="Substring filter for filenames")
    parser.add_argument("--output_directory", default=None,
                        help="Output directory (default: <input>/nellie_output)")
    parser.add_argument("--ch", type=int, default=0, help="Channel to process")
    parser.add_argument("--num_t", type=int, default=None, help="Number of timepoints")
    parser.add_argument("--device", default="auto", choices=["auto", "tpu", "cpu"],
                        help="Compute device")
    parser.add_argument("--remove_edges", action="store_true")
    parser.add_argument("--low_memory", action="store_true")
    parser.add_argument("--timeit", action="store_true", help="Print per-stage wall time")
    args = parser.parse_args(argv)

    process_directory(
        args.directory, args.substring, args.output_directory, args.ch, args.num_t,
        device=args.device, remove_edges=args.remove_edges,
        low_memory=args.low_memory, timeit=args.timeit,
    )


if __name__ == "__main__":
    main()
