"""Persistent XLA compilation cache.

Compile times for the full faceformer graph (wav2vec2 + 3600-step scan) run
into minutes on TPU; the persistent cache turns every subsequent process's
compile into a disk hit (~10 s). Called by all entry points (train.py,
bench.py, __graft_entry__.py).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("A2F_JAX_CACHE_DIR", _DEFAULT_DIR)
    try:
        if jax.default_backend() != "tpu":
            # CPU AOT entries are huge and machine-feature-specific
            # (loading them on another host risks SIGILL); TPU entries are
            # small and portable across same-generation chips
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail an entry point over it
