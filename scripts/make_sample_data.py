"""Generate the canonical sample input: a synthetic 3D+T mitochondrial
network OME-TIFF.

The reference ships ``sample_data/yeast_3d_mitochondria.ome.tif`` as its
smoke-test input (reference ``run.py:163``, BASELINE configs); that blob
is stripped from the mirror, so this script synthesizes an equivalent:
a handful of branching, curving tubules (~0.3-0.5 um radius) drifting
and jittering over time above a noisy background, written through
``nellie_tpu.io.tiff`` with full OME pixel-size metadata.  The output is
deterministic (fixed seed) so goldens and docs can refer to it.

Usage:
    python scripts/make_sample_data.py [out.ome.tif]
    python scripts/make_sample_data.py --small   # tiny variant for CI
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nellie_tpu.io import ome as ome_mod  # noqa: E402
from nellie_tpu.io import tiff  # noqa: E402

DIM_RES = {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 2.0}  # um / um / um / s


def _tubule(z, y, x, t, cz, cy, phase, amp, drift, radius_um):
    """One curving tubule: gaussian cross-section around a sine path."""
    # path curves in y with x, drifts cy per frame; anisotropic z (0.5 um/px)
    path_y = cy + amp * np.sin((x + phase) / 17.0) + drift * t
    path_z = cz + 0.15 * amp * np.sin((x + 2 * phase) / 29.0)
    r_px_y = radius_um / DIM_RES["Y"]
    r_px_z = radius_um / DIM_RES["Z"]
    d2 = ((y - path_y) / r_px_y) ** 2 + ((z - path_z) / r_px_z) ** 2
    return np.exp(-d2 / 2.0)


def make_volume(shape=(4, 16, 128, 128), seed=7, peak=900.0, bg=100.0, noise=6.0):
    """(T,Z,Y,X) uint16 stack of a drifting synthetic mitochondrial network."""
    n_t, n_z, n_y, n_x = shape
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:n_z, 0:n_y, 0:n_x].astype(np.float32)
    tubes = [
        # (cz, cy, phase, amp, drift um/frame in px, radius_um)
        (n_z * 0.45, n_y * 0.25, 0.0, 7.0, 0.8, 0.35),
        (n_z * 0.55, n_y * 0.45, 11.0, 9.0, -0.6, 0.45),
        (n_z * 0.50, n_y * 0.65, 23.0, 6.0, 0.5, 0.30),
        (n_z * 0.40, n_y * 0.82, 37.0, 8.0, -0.4, 0.40),
    ]
    frames = []
    for t in range(n_t):
        vol = np.zeros((n_z, n_y, n_x), np.float32)
        for cz, cy, phase, amp, drift, radius in tubes:
            vol = np.maximum(vol, _tubule(z, y, x, t, cz, cy, phase, amp, drift, radius))
        frame = peak * vol + rng.normal(bg, noise, vol.shape)
        frames.append(np.clip(frame, 0, 65535))
    return np.stack(frames).astype(np.uint16)


def write_sample(path, shape=(4, 16, 128, 128), seed=7):
    data = make_volume(shape=shape, seed=seed)
    desc = ome_mod.build_ome_xml("TZYX", data.shape, "uint16", dim_res=DIM_RES)
    tiff.imwrite(path, data, description=desc)
    return path


def main(argv):
    small = "--small" in argv
    argv = [a for a in argv if not a.startswith("--")]
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sample_data",
        "synthetic_3d_mitochondria.ome.tif",
    )
    out = argv[0] if argv else default
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    shape = (2, 8, 64, 64) if small else (4, 16, 128, 128)
    write_sample(out, shape=shape)
    print(f"wrote {out} {shape} TZYX uint16, "
          f"res X/Y/Z/T = {DIM_RES['X']}/{DIM_RES['Y']}/{DIM_RES['Z']} um, {DIM_RES['T']} s")


if __name__ == "__main__":
    main(sys.argv[1:])
