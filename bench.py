"""Benchmark harness: Frangi + eigendecomposition + segmentation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "voxels/sec/chip", "vs_baseline": N}

The measured kernel is the pipeline's hot path (multi-scale Frangi with
closed-form eigendecomposition, global log-domain thresholding and
connected-component instance segmentation — the Filter+Label compute of
SURVEY.md §3) on one 3D frame, steady-state (post-compile) on the
available accelerator.

``vs_baseline`` compares against the reference pipeline's CPU
implementation semantics: a numpy/scipy port of the identical per-frame
algorithm (scipy gaussian_filter cascade, np.gradient Hessian, LAPACK
eigvalsh on masked voxels, scipy ndimage label), timed on this host —
the reference itself cannot run here (its deps aren't installed), so its
exact CPU algorithm is re-timed in its native numpy/scipy form.
"""
import json
import os
import sys
import threading
import time

import numpy as np

_emit_lock = threading.Lock()
_emitted = False


def _emit(record):
    """Print the one-line JSON result exactly once (main path or watchdog).

    Serialises a shallow copy — the watchdog can fire while main() is
    still inserting keys — and only marks emitted after a successful
    print, falling back to a minimal record so SOME line always lands."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        try:
            line = json.dumps(dict(record))
        except Exception:  # noqa: BLE001 — concurrent mutation mid-copy
            line = json.dumps({k: record.get(k) for k in
                               ("metric", "value", "unit", "vs_baseline")})
        print(line)
        sys.stdout.flush()
        _emitted = True


def _arm_watchdog(record, budget_s):
    """After the headline metric exists, guarantee the JSON line gets out
    even if a later, additive phase (link probe, e2e, CPU floor) wedges in
    a device call — the tunnelled backend can hang indefinitely when the
    link drops, and a lost BENCH line is worse than a partial one.
    Hard-exits: a daemon thread abandoned mid-device-call must not run
    interpreter shutdown."""
    def fire():
        try:
            print(f"[bench] watchdog: {budget_s}s budget exhausted — emitting "
                  "partial record", file=sys.stderr)
            sys.stderr.flush()
            _emit(record)
        finally:
            os._exit(0)

    t = threading.Timer(budget_s, fire)
    t.daemon = True
    t.start()
    return t


def _make_frame(shape=(64, 256, 256), seed=0):
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0 : shape[0], 0 : shape[1], 0 : shape[2]]
    vol = np.zeros(shape, np.float32)
    for i in range(6):
        cy = 30 + 32 * i
        vol += 800.0 * np.exp(
            -(((z - 32 - 8 * np.sin((x + 20 * i) / 30.0)) ** 2) * 0.3
              + (y - cy + 10 * np.sin(x / 17.0)) ** 2 / 2) / (2 * 2.2**2))
    return np.clip(vol + rng.normal(100, 5, shape), 0, None).astype(np.float32)


def _numpy_reference_seconds(frame, params, min_area):
    """The reference's CPU algorithm (scipy/numpy), one frame, one pass."""
    import scipy.ndimage as ndi

    def np_threshold(vals, nbins=256):
        counts, edges = np.histogram(vals, bins=nbins, range=(vals.min(), vals.max()))
        centers = (edges[:-1] + edges[1:]) / 2
        p = counts / max(counts.sum(), 1)
        w1 = np.cumsum(p)
        m1 = np.divide(np.cumsum(p * centers), w1, out=np.zeros_like(w1), where=w1 > 0)
        w2 = np.cumsum(p[::-1])[::-1]
        m2 = (np.divide(np.cumsum((p * centers)[::-1]), np.cumsum(p[::-1]),
                        out=np.zeros(nbins), where=np.cumsum(p[::-1]) > 0))[::-1]
        var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
        return centers[np.argmax(var12)]

    start = time.perf_counter()
    gauss = frame.astype(np.float32)
    vessel = np.zeros_like(gauss)
    prev = 0.0
    for sigma in params.sigmas:
        vp = params.sigma_vec(prev)
        vc = params.sigma_vec(sigma)
        delta = tuple(np.sqrt(max(0.0, c * c - p * p)) for p, c in zip(vp, vc))
        if any(d > 0 for d in delta):
            gauss = ndi.gaussian_filter(gauss, delta, mode="reflect", truncate=3.0)
        prev = sigma
        pos = gauss[gauss > 0]
        gamma = np_threshold(pos) if pos.size else 1.0
        gamma_sq = 2 * gamma * gamma
        g0, g1, g2 = np.gradient(gauss, *params.spacing)
        hxx = np.gradient(g0, params.spacing[0], axis=0)
        hxy = np.gradient(g0, params.spacing[1], axis=1)
        hxz = np.gradient(g0, params.spacing[2], axis=2)
        hyy = np.gradient(g1, params.spacing[1], axis=1)
        hyz = np.gradient(g1, params.spacing[2], axis=2)
        hzz = np.gradient(g2, params.spacing[2], axis=2)
        frob = np.sqrt(hxx**2 + hyy**2 + hzz**2 + 2 * (hxy**2 + hxz**2 + hyz**2))
        max_abs = max(np.abs(c).max() for c in (hxx, hxy, hxz, hyy, hyz, hzz)) or 1.0
        frob /= max_abs
        h_mask = frob > (np_threshold(frob[frob > 0]) / 2 if (frob > 0).any() else 0)
        idx = np.where(h_mask)
        H = np.zeros((idx[0].size, 3, 3), np.float32)
        H[:, 0, 0], H[:, 0, 1], H[:, 0, 2] = hxx[idx], hxy[idx], hxz[idx]
        H[:, 1, 0], H[:, 1, 1], H[:, 1, 2] = hxy[idx], hyy[idx], hyz[idx]
        H[:, 2, 0], H[:, 2, 1], H[:, 2, 2] = hxz[idx], hyz[idx], hzz[idx]
        ev = np.linalg.eigvalsh(H)
        order = np.argsort(np.abs(ev), axis=1)
        ev = np.take_along_axis(ev, order, axis=1)
        l1, l2, l3 = ev[:, 0], ev[:, 1], ev[:, 2]
        ra = (np.abs(l2) / (np.abs(l3) + 1e-12)) ** 2
        rb = (np.abs(l2) / (np.sqrt(np.abs(l2 * l3)) + 1e-12)) ** 2
        s2 = l1**2 + l2**2 + l3**2
        v = (1 - np.exp(-ra / 0.5)) * np.exp(-rb / 0.5) * (1 - np.exp(-s2 / gamma_sq))
        v[(l3 > 0) | (l2 > 0)] = 0
        out = np.zeros_like(gauss)
        out[idx] = np.nan_to_num(v)
        vessel = np.maximum(vessel, out)
    # segmentation
    pos = vessel[vessel > 0]
    if pos.size:
        thr = 10 ** np_threshold(np.log10(pos))
        mask = vessel > thr
        mask = ndi.binary_fill_holes(mask)
        labels, _ = ndi.label(mask, structure=np.ones((3, 3, 3)))
        areas = np.bincount(labels.ravel())
        areas[0] = 0
        mask = (areas >= min_area)[labels]
        mask = ndi.uniform_filter(mask.astype(np.float32), 3) > 0.5
        ndi.label(mask, structure=np.ones((3, 3, 3)))
    return time.perf_counter() - start


def _cpu_reference_e2e(shape=(2, 64, 256, 256), n_runs=2):
    """Full seven-stage CPU reference floor (numpy/scipy oracle chain,
    tests/oracle/e2e_cpu.py) on bench-size frames — the denominator of
    the driver-captured ``e2e_vs_cpu`` ratio.

    Methodology (VERDICT r3 weak #5): BLAS/OpenMP thread count pinned to
    the host's cpu_count via threadpoolctl, ``n_runs`` full runs, and the
    FASTEST run wins — the conservative (lowest) speedup ratio.  The
    thread count and run count are recorded in the bench JSON so floors
    measured on different hosts are comparable."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from oracle.e2e_cpu import run_cpu_reference

    t_frames, *vol = shape
    frames = np.stack([
        np.roll(_make_frame(tuple(vol), seed=0), shift=3 * t, axis=1)
        for t in range(t_frames)
    ])
    data = np.clip(frames, 0, 65535).astype(np.uint16)

    threads = os.cpu_count() or 1
    try:
        from threadpoolctl import threadpool_limits
    except Exception:  # noqa: BLE001 — pinning is best-effort
        import contextlib

        def threadpool_limits(limits):  # noqa: ANN001
            return contextlib.nullcontext()

    best = None
    with threadpool_limits(limits=threads):
        for i in range(max(1, n_runs)):
            _, times = run_cpu_reference(data, {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 2.0})
            print(f"[bench] CPU floor run {i + 1}/{n_runs}: "
                  f"{times['total'] / t_frames:.1f}s/frame", file=sys.stderr)
            if best is None or times["total"] < best["total"]:
                best = times
    return best, t_frames, int(np.prod(vol)), threads, n_runs


def _recorded_cpu_floor():
    """The persisted CPU floor (BASELINE.json "published") — the driver's
    own capture from a prior round, so round-over-round ratios share a
    denominator even when host load varies.  Returns (s_per_frame or
    None, per-stage dict or None)."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            pub = json.load(f).get("published", {})
        return (pub.get("e2e_cpu_floor_s_per_frame"),
                pub.get("e2e_cpu_stage_floor_s_per_frame"))
    except Exception:  # noqa: BLE001
        return None, None


def _ratio_from_persisted_floor(record, tunnel_down):
    """If the fresh CPU floor never ran (env-skipped, watchdog-tight
    budget) or died mid-run, the persisted driver-captured floor
    (BASELINE.json "published", a prior round's own measurement on this
    host class) still gives the north-star ratio rather than omitting it
    — labelled with its provenance so a persisted-floor ratio is
    distinguishable from one backed by a same-run measurement."""
    if ("e2e_s_per_frame" not in record or "e2e_vs_cpu" in record
            or "e2e_vs_cpu_cpu_fallback" in record):
        return
    rec_floor, rec_stage = _recorded_cpu_floor()
    if not rec_floor:
        return
    record["e2e_cpu_floor_s_per_frame"] = round(rec_floor, 2)
    record["e2e_cpu_floor_source"] = "persisted (BASELINE.json)"
    vs_key = "e2e_vs_cpu_cpu_fallback" if tunnel_down else "e2e_vs_cpu"
    record[vs_key] = round(rec_floor / record["e2e_s_per_frame"], 1)
    tpu_stage = record.get("e2e_stage_s_per_frame", {})
    vs_stage = {}
    if rec_stage:
        seg_cpu = sum(rec_stage.get(k, 0.0) for k in
                      ("filter", "label", "network", "markers"))
        if "seg_fused" in tpu_stage and seg_cpu:
            vs_stage["segmentation"] = round(seg_cpu / tpu_stage["seg_fused"], 1)
        for k in ("tracking", "reassign", "hierarchy"):
            if k in tpu_stage and rec_stage.get(k):
                vs_stage[k] = round(rec_stage[k] / tpu_stage[k], 1)
    if vs_stage:
        record["vs_cpu_per_stage_cpu_fallback" if tunnel_down
               else "vs_cpu_per_stage"] = vs_stage
    print(f"[bench] CPU floor from persisted BASELINE.json: "
          f"{rec_floor:.1f}s/frame -> {vs_key} = {record[vs_key]}x",
          file=sys.stderr)


def _e2e_warm_timings(shape=(3, 64, 256, 256)):
    """Full seven-stage pipeline, steady-state: run once cold (compiles),
    once warm on identical shapes; returns (warm per-stage dict, warm
    total seconds, frames, voxels/frame).  The e2e metric of
    BASELINE.json ("sec/frame end-to-end 3D pipeline")."""
    import shutil
    import tempfile

    from nellie_tpu.io import ome as ome_mod
    from nellie_tpu.io import tiff
    from nellie_tpu.io.verifier import FileInfo
    from nellie_tpu.pipeline.run import run

    t_frames, *vol = shape
    frames = np.stack([
        np.roll(_make_frame(tuple(vol), seed=0), shift=3 * t, axis=1)
        for t in range(t_frames)
    ])
    data = np.clip(frames, 0, 65535).astype(np.uint16)
    desc = ome_mod.build_ome_xml(
        "TZYX", data.shape, "uint16",
        dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 2.0})

    root = tempfile.mkdtemp(prefix="nellie_bench_e2e_")
    try:
        timings = {}
        for sub in ("cold", "warm"):
            d = os.path.join(root, sub)
            os.makedirs(d)
            path = os.path.join(d, "bench.ome.tif")
            tiff.imwrite(path, data, description=desc)
            fi = FileInfo(path)
            fi.find_metadata()
            fi.load_metadata()
            # timeit=False: stdout must stay a single JSON line for the
            # driver; per-stage numbers come back via return_timings
            _, timings = run(fi, return_timings=True)
        return timings, float(timings["total"]), t_frames, int(np.prod(vol))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _make_frame_2d(shape=(512, 512), seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0 : shape[0], 0 : shape[1]]
    img = np.zeros(shape, np.float32)
    for i in range(5):
        cy = 50 + (shape[0] // 5) * i
        img += 700.0 * np.exp(
            -((y - cy + 10 * np.sin((x + 15 * i) / 19.0)) ** 2) / (2 * 2.0**2))
    return np.clip(img + rng.normal(80, 5, shape), 0, None).astype(np.float32)


def _e2e_2d_timings(shape=(4, 512, 512)):
    """BASELINE config #2: 2D + timeseries pipeline (Frangi + labelling +
    tracking per frame), cold + warm in one process; returns (warm total
    seconds, frames)."""
    import shutil
    import tempfile

    from nellie_tpu.io import ome as ome_mod
    from nellie_tpu.io import tiff
    from nellie_tpu.io.verifier import FileInfo
    from nellie_tpu.pipeline.run import run

    t_frames = shape[0]
    frames = np.stack([
        np.roll(_make_frame_2d(shape[1:], seed=0), shift=2 * t, axis=0)
        for t in range(t_frames)
    ])
    data = np.clip(frames, 0, 65535).astype(np.uint16)
    desc = ome_mod.build_ome_xml(
        "TYX", data.shape, "uint16",
        dim_res={"X": 0.1, "Y": 0.1, "Z": None, "T": 2.0})

    root = tempfile.mkdtemp(prefix="nellie_bench_2d_")
    try:
        timings = {}
        for sub in ("cold", "warm"):
            d = os.path.join(root, sub)
            os.makedirs(d)
            path = os.path.join(d, "bench2d.ome.tif")
            tiff.imwrite(path, data, description=desc)
            fi = FileInfo(path)
            fi.find_metadata()
            fi.load_metadata()
            _, timings = run(fi, return_timings=True)
        return float(timings["total"]), t_frames
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _batch_files_timing(n_files=3, shape=(2, 32, 128, 128)):
    """BASELINE config #5: batch multi-file organelle run (ER + mito
    morphologies as separate files) through pipeline.batch.run_files,
    with per-file feature CSV export.  Warm measurement: the shapes
    match, so every program is compiled by the first file; the recorded
    number is the wall for the REMAINING files (steady-state files/min).
    On one chip run_files degrades to the sequential loop — the mesh
    data-parallel path is covered by tests/test_mesh.py and the
    multichip dryrun.  Returns (warm seconds, n_files - 1)."""
    import shutil
    import tempfile

    from nellie_tpu.io import ome as ome_mod
    from nellie_tpu.io import tiff
    from nellie_tpu.io.verifier import FileInfo
    from nellie_tpu.pipeline.batch import run_files

    t_frames, *vol = shape
    root = tempfile.mkdtemp(prefix="nellie_bench_batch_")
    try:
        file_infos = []
        for i in range(n_files):
            frames = np.stack([
                np.roll(_make_frame(tuple(vol), seed=i), shift=3 * t + i, axis=1)
                for t in range(t_frames)
            ])
            data = np.clip(frames, 0, 65535).astype(np.uint16)
            desc = ome_mod.build_ome_xml(
                "TZYX", data.shape, "uint16",
                dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 2.0})
            path = os.path.join(root, f"organelle_{i}.ome.tif")
            tiff.imwrite(path, data, description=desc)
            fi = FileInfo(path)
            fi.find_metadata()
            fi.load_metadata()
            file_infos.append(fi)
        run_files(file_infos[:1])  # compile pass
        t0 = time.perf_counter()
        run_files(file_infos[1:])
        return time.perf_counter() - t0, n_files - 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _probe_accelerator(timeout_s=240.0):
    """Enumerate devices in a SUBPROCESS with a hard timeout.

    ``jax.devices()`` on the tunnelled axon platform hangs indefinitely
    when the tunnel is down (observed: >300 s, and the tunnel has stayed
    dead for 8+ hour stretches) — and it runs before any in-process
    watchdog can be armed, so a dead tunnel would otherwise mean NO bench
    JSON at all.  Returns the platform string of device 0, or None if
    enumeration did not answer inside the budget."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True)
        if r.returncode == 0 and r.stdout.strip():
            return r.stdout.strip().splitlines()[-1]
    except Exception:  # noqa: BLE001 — timeout or crashed probe == dead
        pass
    return None


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from nellie_tpu.kernels import frangi as frangi_k
    from nellie_tpu.mesh.sharded import _segment_step
    from nellie_tpu.utils.jax_cache import enable_persistent_cache

    shape = (64, 256, 256)
    n_vox = int(np.prod(shape))
    frame = _make_frame(shape)
    params = frangi_k.FrangiParams(
        sigmas=(0.625, 0.825, 1.025, 1.225, 1.425),
        spacing=(0.5, 0.2, 0.2), z_ratio=2.5,
    )
    min_area = 4

    probe_budget = float(os.environ.get("NELLIE_BENCH_PROBE_S", "240"))
    platform = _probe_accelerator(probe_budget) if probe_budget > 0 else "unprobed"
    tunnel_down = platform is None
    if tunnel_down:
        # Honest fallback: measure the same programs on the host CPU via
        # JAX rather than emitting nothing (or hanging forever).  The
        # record is labelled so a CPU-fallback number is never mistaken
        # for a TPU capture; BENCH_r04.json holds the last TPU capture.
        print(f"[bench] accelerator tunnel did not answer within "
              f"{probe_budget:.0f}s — falling back to host-CPU JAX "
              "(see 'note' in the emitted record)", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

    dev = jax.devices()[0]

    # the remote compile server's latency has unbounded variance (a
    # sort-bearing program: 60 s one hour, >25 min the next); with a warm
    # repo-local cache the driver's run never pays it twice.  Enabled
    # AFTER platform resolution: the helper initialises the backend (it
    # must know cpu-vs-accelerator), which would hang on a dead tunnel
    # if called before the enumeration probe above.
    cache_dir = enable_persistent_cache()
    if cache_dir:
        print(f"[bench] persistent compile cache: {cache_dir}",
              file=sys.stderr)

    # pre-headline insurance: the tunnel uplink and the remote compile
    # server both have unbounded variance (observed: a 16 MB upload or a
    # sort-bearing compile taking 60 s one hour and >45 min the next) —
    # if the first upload+compile stalls past this budget, emit a minimal
    # record naming the stall instead of producing no JSON line at all.
    # Disarmed (superseded) once the real measurement exists.
    compile_budget = float(os.environ.get("NELLIE_BENCH_COMPILE_WATCHDOG_S",
                                          "3600"))
    compile_watchdog = None
    if compile_budget > 0:
        compile_watchdog = _arm_watchdog({
            "metric": "frangi+eigen+segment voxels/sec/chip (3D 64x256x256 frame)",
            "value": 0,
            "unit": "voxels/sec/chip",
            "vs_baseline": 0,
            "error": f"first upload+compile exceeded {compile_budget:.0f}s "
                     "(tunnel uplink / remote compile-server stall); no "
                     "steady-state measurement possible this run",
        }, compile_budget)

    frame_dev = jax.device_put(jnp.asarray(frame), dev)

    # warmup / compile (forcing device->host materialisation: on the
    # tunnelled axon platform block_until_ready is not a reliable fence)
    t_compile0 = time.perf_counter()
    vessel, labels, n = _segment_step(frame_dev, params, min_area)
    sink = float(jnp.sum(vessel)) + int(n)
    compile_s = time.perf_counter() - t_compile0
    if compile_watchdog is not None:
        compile_watchdog.cancel()
    print(f"[bench] compile+first-run: {compile_s:.1f}s on {dev.platform}", file=sys.stderr)

    # steady state — dispatch all reps back-to-back and fence once at the
    # end (frames pipeline in production; per-rep fencing would measure
    # the tunnel's dispatch latency, not throughput)
    @jax.jit
    def _digest(vessel, labels, n):
        return jnp.sum(vessel) + jnp.max(labels).astype(jnp.float32) + n

    reps = 6
    digests = []
    t0 = time.perf_counter()
    for _ in range(reps):
        vessel, labels, n = _segment_step(frame_dev, params, min_area)
        digests.append(_digest(vessel, labels, n))
    sink += sum(float(d) for d in digests)
    per_frame = (time.perf_counter() - t0) / reps
    vox_per_sec = n_vox / per_frame
    print(f"[bench] steady-state: {per_frame:.3f}s/frame, {vox_per_sec:,.0f} vox/s, "
          f"{int(n)} labels", file=sys.stderr)

    # roofline for the segment kernel (VERDICT r3 weak #3): XLA's own
    # cost analysis of the compiled program vs v5e peaks — names whether
    # the kernel is HBM- or compute-bound and how far from the ceiling.
    # v5e-1: ~197 TFLOP/s bf16 MXU (f32 elementwise runs on the VPU well
    # below that), ~819 GB/s HBM.
    roofline = None
    try:
        lowered = jax.jit(
            lambda f: _segment_step(f, params, min_area)).lower(frame_dev)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        hbm_bytes = float(ca.get("bytes accessed", 0.0))
        if flops and hbm_bytes:
            gflops_s = flops / per_frame / 1e9
            gbytes_s = hbm_bytes / per_frame / 1e9
            pct_flops = 100.0 * gflops_s / 197_000.0
            pct_hbm = 100.0 * gbytes_s / 819.0
            bound = "HBM" if pct_hbm >= pct_flops else "compute"
            roofline = {
                "flops_per_frame": flops,
                "hbm_bytes_per_frame": hbm_bytes,
                "achieved_gflops_s": round(gflops_s, 1),
                "achieved_gb_s": round(gbytes_s, 1),
                "pct_of_bf16_peak": round(pct_flops, 2),
                "pct_of_hbm_roofline": round(pct_hbm, 1),
                "bound": bound,
            }
            print(f"[bench] roofline: {gflops_s:,.0f} GFLOP/s "
                  f"({pct_flops:.2f}% of bf16 MXU peak), {gbytes_s:,.0f} GB/s "
                  f"({pct_hbm:.1f}% of HBM roofline) -> {bound}-bound",
                  file=sys.stderr)
    except Exception as exc:  # noqa: BLE001 — additive diagnostics only
        print(f"[bench] roofline unavailable: {exc!r}", file=sys.stderr)

    # CPU reference-algorithm baseline (numpy/scipy, identical semantics);
    # best of two runs — conservative (lowest) speedup ratio
    base_s = min(_numpy_reference_seconds(frame, params, min_area) for _ in range(2))
    base_vox_per_sec = n_vox / base_s
    print(f"[bench] numpy/scipy reference (best of 2): {base_s:.1f}s/frame "
          f"({base_vox_per_sec:,.0f} vox/s)", file=sys.stderr)

    record = {
        "metric": "frangi+eigen+segment voxels/sec/chip (3D 64x256x256 frame)",
        "value": round(vox_per_sec),
        "unit": "voxels/sec/chip",
        "vs_baseline": round(vox_per_sec / base_vox_per_sec, 2),
        "platform": dev.platform,
    }
    if tunnel_down:
        record["note"] = (
            "TPU tunnel unreachable at bench time (device enumeration timed "
            "out); all numbers measured on host-CPU JAX as a fallback. The "
            "last TPU capture is BENCH_r04.json (e2e_vs_cpu 31.3).")
    if roofline is not None and not tunnel_down:
        record["roofline"] = roofline

    # everything below is additive context; don't let a link drop mid-run
    # swallow the headline (NELLIE_BENCH_WATCHDOG_S=0 disables)
    budget_s = float(os.environ.get("NELLIE_BENCH_WATCHDOG_S", "2700"))
    if budget_s > 0:
        _arm_watchdog(record, budget_s)

    # device->host link health: the per-frame stage loops are transfer-
    # bound on tunnelled backends, so e2e numbers are only interpretable
    # next to the link bandwidth at measurement time (observed range on
    # the shared tunnel: 0.3 - 30+ MB/s)
    try:
        probe = jnp.zeros((16, 1024, 1024), jnp.float32)  # 64 MB
        probe = jax.device_put(probe, dev) + 1.0
        float(jnp.sum(probe))  # fence
        t0 = time.perf_counter()
        np.asarray(probe)
        record_link = round(64.0 / (time.perf_counter() - t0), 1)
    except Exception:  # noqa: BLE001
        record_link = None
    record["link_down_mb_per_s"] = record_link
    print(f"[bench] device->host link: {record_link} MB/s", file=sys.stderr)

    # full seven-stage warm end-to-end (skippable: NELLIE_BENCH_E2E=0)
    if os.environ.get("NELLIE_BENCH_E2E", "1") != "0":
        try:
            stage_s, total_s, t_frames, vox = _e2e_warm_timings()
            record["e2e_s_per_frame"] = round(total_s / t_frames, 3)
            record["e2e_mvox_per_s"] = round(t_frames * vox / total_s / 1e6, 2)
            record["e2e_stage_s_per_frame"] = {
                k: round(v / t_frames, 3) for k, v in stage_s.items()
                if k != "total"}
            print(f"[bench] e2e warm: {record['e2e_s_per_frame']}s/frame, "
                  f"{record['e2e_mvox_per_s']} Mvox/s "
                  f"({t_frames}x{vox / 1e6:.1f} Mvox frames)", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — e2e is additive, never fatal
            print(f"[bench] e2e skipped: {exc!r}", file=sys.stderr)

    # CPU reference floor: the numpy/scipy oracle chain end-to-end at the
    # same frame size — denominator for the e2e ratio (NELLIE_BENCH_CPU=0
    # to skip; ~8-12 min of pure host compute for the two pinned runs).
    # The effective floor is min(measured best-of-2, the floor persisted
    # in BASELINE.json) — conservative in both directions: a loaded host
    # can only LOWER the reported speedup, never inflate it.
    if (os.environ.get("NELLIE_BENCH_CPU", "1") != "0"
            and "e2e_s_per_frame" in record):
        try:
            cpu_times, cpu_frames, cpu_vox, threads, n_runs = _cpu_reference_e2e()
            cpu_spf = cpu_times["total"] / cpu_frames
            cpu_stage = {k: round(v / cpu_frames, 2) for k, v in cpu_times.items()
                         if k != "total"}
            record["e2e_cpu_s_per_frame"] = round(cpu_spf, 2)
            record["e2e_cpu_stage_s_per_frame"] = cpu_stage
            record["e2e_cpu_threads"] = threads
            record["e2e_cpu_runs"] = n_runs
            rec_floor, rec_stage = _recorded_cpu_floor()
            floor = min(x for x in (cpu_spf, rec_floor) if x)
            record["e2e_cpu_floor_s_per_frame"] = round(floor, 2)
            # In CPU-fallback mode the ratio is JAX-on-CPU vs numpy-on-CPU —
            # real, but NOT the TPU north-star number; keep the key distinct
            # so a fallback run can never masquerade as a TPU capture.
            vs_key = "e2e_vs_cpu_cpu_fallback" if tunnel_down else "e2e_vs_cpu"
            record[vs_key] = round(floor / record["e2e_s_per_frame"], 1)
            print(f"[bench] CPU reference e2e: measured {cpu_spf:.1f}s/frame "
                  f"({threads} threads, best of {n_runs}), floor {floor:.1f} "
                  f"-> {vs_key} = {record[vs_key]}x", file=sys.stderr)

            # per-stage speedups vs the reference's own CUDA-port table
            # (BASELINE.md): tracking >= 6x, reassign >= 2x etc. are
            # checkable per stage, not just in aggregate (VERDICT r3 #7)
            stage_floor = dict(cpu_stage)
            if rec_stage:
                for k, v in rec_stage.items():
                    stage_floor[k] = min(stage_floor.get(k, v), v)
            tpu_stage = record.get("e2e_stage_s_per_frame", {})
            vs_stage = {}
            seg_cpu = sum(stage_floor.get(k, 0.0) for k in
                          ("filter", "label", "network", "markers"))
            if "seg_fused" in tpu_stage and seg_cpu:
                vs_stage["segmentation"] = round(seg_cpu / tpu_stage["seg_fused"], 1)
            for k in ("tracking", "reassign", "hierarchy"):
                if k in tpu_stage and stage_floor.get(k):
                    vs_stage[k] = round(stage_floor[k] / tpu_stage[k], 1)
            record["vs_cpu_per_stage_cpu_fallback" if tunnel_down
                   else "vs_cpu_per_stage"] = vs_stage
            print(f"[bench] per-stage vs CPU: {vs_stage}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — additive, never fatal
            print(f"[bench] CPU reference floor skipped: {exc!r}", file=sys.stderr)

    _ratio_from_persisted_floor(record, tunnel_down)

    # BASELINE config #2: 2D + timeseries pipeline (NELLIE_BENCH_2D=0 skips)
    if os.environ.get("NELLIE_BENCH_2D", "1") != "0":
        try:
            total_s, t_frames = _e2e_2d_timings()
            record["e2e_2d_s_per_frame"] = round(total_s / t_frames, 3)
            print(f"[bench] 2D e2e warm: {record['e2e_2d_s_per_frame']}s/frame "
                  f"({t_frames}x512x512)", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — additive, never fatal
            print(f"[bench] 2D e2e skipped: {exc!r}", file=sys.stderr)

    # BASELINE config #5: batch multi-file run (NELLIE_BENCH_BATCH=0 skips)
    if os.environ.get("NELLIE_BENCH_BATCH", "1") != "0":
        try:
            batch_s, n_warm = _batch_files_timing()
            record["batch_files"] = n_warm
            record["batch_files_per_min"] = round(n_warm / (batch_s / 60.0), 2)
            print(f"[bench] batch: {n_warm} warm files in {batch_s:.1f}s = "
                  f"{record['batch_files_per_min']} files/min "
                  "(2x2.1 Mvox frames each)", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — additive, never fatal
            print(f"[bench] batch skipped: {exc!r}", file=sys.stderr)

    _emit(record)


if __name__ == "__main__":
    main()
