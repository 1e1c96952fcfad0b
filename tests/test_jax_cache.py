"""Persistent compile-cache helper (utils/jax_cache.py)."""
import os

import jax

from nellie_tpu.utils.jax_cache import enable_persistent_cache


def _current_dir():
    return jax.config.jax_compilation_cache_dir


def test_enable_sets_config_and_writes_entries(tmp_path, monkeypatch):
    monkeypatch.delenv("NELLIE_JAX_CACHE", raising=False)
    prev = _current_dir()
    try:
        d = enable_persistent_cache(str(tmp_path / "jc"))
        assert d == str(tmp_path / "jc")
        assert _current_dir() == d

        import jax.numpy as jnp

        @jax.jit
        def f(x):
            return jnp.sum(x * 3 + 1)

        assert float(f(jnp.ones((64, 64)))) == 64 * 64 * 4
        assert os.path.isdir(d) and len(os.listdir(d)) >= 1
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_env_opt_out(monkeypatch):
    monkeypatch.setenv("NELLIE_JAX_CACHE", "0")
    prev = _current_dir()
    assert enable_persistent_cache("/tmp/should_not_be_used") is None
    assert _current_dir() == prev


def test_cpu_backend_disabled_without_explicit_dir(monkeypatch):
    # JAX's cache key zeroes xla_force_host_platform_device_count, so CPU
    # entries collide across host topologies (observed SIGSEGV when an
    # 8-device test process deserialized a 1-device process's entry) —
    # on the CPU backend the helper must refuse the implicit default dir.
    monkeypatch.delenv("NELLIE_JAX_CACHE", raising=False)
    prev = _current_dir()
    assert jax.default_backend() == "cpu"  # conftest forces cpu
    assert enable_persistent_cache() is None
    assert _current_dir() == prev


def test_env_dir_wins(tmp_path, monkeypatch):
    monkeypatch.setenv("NELLIE_JAX_CACHE", str(tmp_path / "env_jc"))
    prev = _current_dir()
    try:
        assert enable_persistent_cache() == str(tmp_path / "env_jc")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
