"""Tests for runtime utilities in pepflowww_tpu.utils.misc."""

import os

import jax
import jax.numpy as jnp

from pepflowww_tpu.utils.misc import enable_compilation_cache


def _reset_cache_config():
    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_compilation_cache_writes_entries(tmp_path):
    cache_dir = str(tmp_path / "xla")
    try:
        # min_compile_secs=0 so even a toy jit persists — the CLIs use the
        # default 1 s floor (see the docstring for why), which would skip it.
        used = enable_compilation_cache(cache_dir, min_compile_secs=0.0)
        assert used == cache_dir and os.path.isdir(cache_dir)
        # A compile distinct from anything the suite has jitted so far,
        # so it cannot have been served from the in-process cache.
        jax.jit(lambda x: jnp.cosh(x * 3.25) @ x.T)(jnp.ones((17, 17)))
        assert os.listdir(cache_dir), "no persistent cache entries written"
    finally:
        _reset_cache_config()


def test_compilation_cache_default_keeps_compile_floor(tmp_path):
    """The CLI call path must NOT cache fast (CPU-helper) compiles: cached
    CPU executables re-trip xla's cpu_aot_loader feature check on every
    warm load (ERROR-level SIGILL noise in every CLI log). 5 s excludes
    them even under heavy concurrent CPU load while keeping every 20-100 s
    TPU executable."""
    try:
        assert enable_compilation_cache(str(tmp_path / "xla")) is not None
        assert (
            jax.config.jax_persistent_cache_min_compile_time_secs == 5.0
        )
    finally:
        _reset_cache_config()


def test_compilation_cache_disabled_and_failsoft(tmp_path, monkeypatch):
    try:
        # "0" via env disables without touching jax config
        monkeypatch.setenv("PEPFLOWWW_CACHE_DIR", "0")
        assert enable_compilation_cache() is None
        # an uncreatable dir must not raise (fail-soft contract)
        bad = str(tmp_path / "file")
        with open(bad, "w") as f:
            f.write("x")
        assert enable_compilation_cache(os.path.join(bad, "sub")) is None
    finally:
        _reset_cache_config()
