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


def parse_mesh(spec):
    """--mesh "8" (all data parallel) or "2x4" (t=2 frames/files x z=4
    spatial) -> jax.sharding.Mesh."""
    if not spec:
        return None
    from nellie_tpu.mesh import make_mesh

    if "x" in spec:
        t_axis, z_axis = (int(v) for v in spec.lower().split("x"))
        return make_mesh(t_axis * z_axis, t_axis=t_axis)
    n = int(spec)
    return make_mesh(n, t_axis=n)


def _prepare_file_info(tif_file, ch, num_t, output_dir):
    from nellie_tpu.io.verifier import FileInfo

    fi = FileInfo(tif_file, output_dir=output_dir)
    fi.find_metadata()
    fi.load_metadata()
    if ch and "C" in (fi.axes or ""):
        fi.change_selected_channel(ch)
    if num_t is not None and "T" in (fi.axes or ""):
        fi.select_temporal_range(0, num_t - 1)
    errors = fi.get_validation_errors()
    if errors:
        raise ValueError(f"Metadata incomplete for {tif_file}: {errors}")
    return fi


def process_files(files, ch, num_t, output_dir, mesh=None, timeit=False, **kwargs):
    # the batched multi-file path takes no per-stage kwargs: config runs
    # go file-by-file through run(), which accepts the mesh as-is (t>1
    # batches frames, spatial axes shard kernels, stages 5-7 go
    # frame-parallel)
    if (mesh is not None and int(mesh.shape.get("t", 1)) > 1 and len(files) > 1
            and kwargs.get("config") is None):
        # data-parallel across files over the mesh 't' axis
        from nellie_tpu.pipeline.batch import run_files

        file_infos = []
        for tif_file in files:
            try:
                file_infos.append(_prepare_file_info(tif_file, ch, num_t, output_dir))
            except Exception as exc:  # noqa: BLE001 - batch robustness
                print(f"Failed to prepare {tif_file}: {exc}")
        if file_infos:
            run_files(file_infos, mesh=mesh, timeit=timeit, **kwargs)
        return
    for file_num, tif_file in enumerate(files):
        print(f"Processing file {file_num + 1} of {len(files)}, channel {ch}")
        try:
            run_path(
                tif_file, ch=ch,
                t_end=(num_t - 1 if num_t is not None else None),
                output_dir=output_dir, mesh=mesh, timeit=timeit, **kwargs,
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
    parser.add_argument("--mesh", default=None,
                        help='Device mesh spec: "8" (data parallel) or "2x4" '
                             "(t-axis x z-axis); frames/files shard over 't', "
                             "space over 'z'")
    parser.add_argument("--config", default=None,
                        help="Path to a SettingsConfig JSON (the GUI Settings "
                             "tab's full per-stage parameter tree; see "
                             "nellie_tpu.plugin.config). Drives every stage's "
                             "kwargs; --device/--low_memory/--remove_edges "
                             "override the corresponding config fields.")
    args = parser.parse_args(argv)

    config = None
    if args.config is not None:
        import dataclasses

        from nellie_tpu.plugin.config import SettingsConfig

        config = SettingsConfig.load(args.config)
        # explicit CLI flags win over the config's per-stage fields —
        # silently dropping flags typed on the same command line is worse
        for f in dataclasses.fields(config):
            if args.device != "auto" and f.name.endswith("_device"):
                setattr(config, f.name, args.device)
            if args.low_memory and f.name.endswith("_low_memory"):
                setattr(config, f.name, True)
        if args.remove_edges:
            config.remove_edges = True

    process_directory(
        args.directory, args.substring, args.output_directory, args.ch, args.num_t,
        device=args.device, remove_edges=args.remove_edges,
        low_memory=args.low_memory, timeit=args.timeit,
        mesh=parse_mesh(args.mesh),
        **({} if config is None else {"config": config}),
    )


if __name__ == "__main__":
    main()
