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
    """
    env = os.environ.get("NELLIE_JAX_CACHE")
    if env == "0":
        return None
    cache_dir = cache_dir or env or _DEFAULT_DIR
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — older jax without these knobs
        return None
    return cache_dir
