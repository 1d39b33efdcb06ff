"""Runtime configuration helpers."""

from __future__ import annotations

import os

import jax

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``tmp/jax_cache`` so the
    drivers' many small shape-specialized kernels compile once per machine
    instead of once per process."""
    if path is None:
        path = os.path.join(_REPO_ROOT, "tmp", "jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def use_cpu_x64() -> None:
    """Parity mode: run on CPU with float64 (TPU lacks f64 linalg)."""
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
