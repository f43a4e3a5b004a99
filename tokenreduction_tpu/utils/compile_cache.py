"""Persistent XLA compile cache for the CLI entry points.

Every CLI invocation is a fresh process; without a persistent cache JAX
recompiles every jitted program from scratch (30-400 s per program when
compiling for a remote TPU). bench.py already pins a cache dir; this
helper gives the train/eval CLIs the same behavior with a
user-overridable location.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache() -> str | None:
    """Point jax at an on-disk compilation cache and return its path.

    JAX_COMPILATION_CACHE_DIR (the upstream env var) wins if set —
    jax reads it natively, so nothing to do. Otherwise default to
    ~/.cache/tokenreduction_tpu/jaxcache. Returns None if the directory
    cannot be created (read-only home), in which case compilation simply
    stays uncached, matching the old behavior.
    """
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    path = os.path.join(os.path.expanduser("~"), ".cache",
                        "tokenreduction_tpu", "jaxcache")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    return path
