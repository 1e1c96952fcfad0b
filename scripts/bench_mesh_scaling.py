"""Multi-chip scaling microbenchmark: voxels/sec vs device count.

Drives the PRODUCTION sharded segment step (`mesh.sharded.sharded_segment_step`
— the same `_segment_step` program `run(mesh=)`'s fused batch path vmaps)
over meshes of 1/2/4/8 devices and prints voxels/sec per mesh size.

On this image real multi-chip hardware is unavailable, so the default run
uses the 8-way virtual CPU mesh (`XLA_FLAGS=--xla_force_host_platform_
device_count=8 JAX_PLATFORMS=cpu python scripts/bench_mesh_scaling.py`).
Virtual-mesh numbers measure SHARDING OVERHEAD (halo exchange, collective
insertion, resharding), not chip throughput — useful as a regression
check that the partitioned program stays within ~NX of the 1-device
program's work, and as the harness to run unchanged on a real v5e pod.

Reference analog: the chunk loop this replaces,
/root/reference/nellie/segmentation/filtering.py:855-908.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _honor_platform_env():
    """The axon site hook force-overrides jax_platforms to the tunnelled
    TPU; when the caller explicitly asked for host-platform devices, put
    that request back in effect (same shim as __graft_entry__.py)."""
    wants_cpu = os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu" or (
        "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""))
    if wants_cpu:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def main():
    _honor_platform_env()
    import jax

    from nellie_tpu.kernels import frangi as frangi_k
    from nellie_tpu.mesh import make_mesh
    from nellie_tpu.mesh.sharded import sharded_segment_step

    n_dev = len(jax.devices())
    shape = (2, 16, 64, 128)  # (T, Z, Y, X); Z divisible by all z extents
    rng = np.random.default_rng(0)
    z, y, x = np.mgrid[0: shape[1], 0: shape[2], 0: shape[3]]
    tube = 800.0 * np.exp(
        -(((z - 8) ** 2) * 0.3 + (y - 32 + 6 * np.sin(x / 17.0)) ** 2 / 2)
        / (2 * 2.2 ** 2))
    batch = np.stack([
        np.clip(tube + rng.normal(100, 5, shape[1:]), 0, None)
        for _ in range(shape[0])
    ]).astype(np.float32)
    params = frangi_k.FrangiParams(
        sigmas=(0.75, 0.95, 1.15), spacing=(0.5, 0.2, 0.2), z_ratio=2.5)
    n_vox = int(np.prod(shape))

    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev]
    print(f"devices available: {n_dev} ({jax.default_backend()})", flush=True)
    base = None
    for n in sizes:
        t_axis = 2 if n >= 2 else 1
        mesh = make_mesh(n, t_axis=t_axis)
        # warm (compile)
        out = sharded_segment_step(batch, params, mesh)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = sharded_segment_step(batch, params, mesh)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        vox_s = n_vox / dt
        if base is None:
            base = dt
        print(f"mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}: "
              f"{dt * 1e3:8.1f} ms/batch  {vox_s / 1e6:6.2f} Mvox/s  "
              f"overhead vs 1-dev program: {dt / base:.2f}x wall "
              f"({n * dt / base:.2f}x device-seconds)", flush=True)


if __name__ == "__main__":
    main()
