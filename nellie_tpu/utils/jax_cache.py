"""Persistent XLA compilation-cache setup (opt out: ``NELLIE_JAX_CACHE=0``).

The tunnelled axon backend compiles on a remote compile server whose
latency has unbounded variance — the same sort-bearing program was
measured compiling in ~60 s one hour and >25 min the next.  JAX's
persistent compilation cache works over the tunnel (measured on this
host: a 1M-element ``lax.sort`` program went from 426 s cold to 84 s in
a fresh process with a warm cache), so the entry points that jit
production programs (``bench.py``, ``__graft_entry__.py``,
``pipeline.run``) enable a repo-local cache directory.  A warm cache
makes repeat runs immune to the compile server's mood; cache keys
include the jax version, backend and compile options, so entries are
only ever reused for byte-identical programs.

The reference has no analog (CuPy JIT-compiles elementwise kernels with
its own on-disk cache transparently); this is the TPU-native
replacement for that invisible cache.
"""
from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_DEFAULT_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument, ``NELLIE_JAX_CACHE`` env var,
    the repo-local ``.jax_cache/`` default.  ``NELLIE_JAX_CACHE=0``
    disables entirely.  Returns the directory in effect (or ``None``
    when disabled / unsupported by this jax build).  Safe to call more
    than once; every compile below the size/time floors is cached —
    on the tunnelled backend even trivial programs pay the remote
    compile round-trip, so there is no floor worth keeping.

    CPU backend: DISABLED unless a directory is passed explicitly (arg
    or env var).  JAX's cache key deliberately zeroes
    ``--xla_force_host_platform_device_count`` and hashes only
    *accelerator* topology (``jax/_src/cache_key.py``), so CPU
    executables collide across host-device-count topologies — observed
    here as a hard SIGSEGV when an 8-virtual-device test process
    deserialized an entry written by a 1-device process.  CPU compiles
    are local and fast anyway; the cache exists for the remote TPU
    compile server.  If you do opt in on CPU, give each topology its
    own directory.  (Calling this initialises the JAX backend.)
    """
    env = os.environ.get("NELLIE_JAX_CACHE")
    if env == "0":
        return None
    explicit = cache_dir or env
    import jax

    if not explicit and jax.default_backend() == "cpu":
        return None
    cache_dir = explicit or _DEFAULT_DIR

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — older jax without these knobs
        return None
    return cache_dir
