"""Persistent XLA compilation cache.

Compile times for the full faceformer graph (wav2vec2 + 3600-step scan) run
into minutes on TPU; the persistent cache turns every subsequent process's
compile into a disk hit (~10 s). Called by all entry points (train.py,
bench.py, __graft_entry__.py).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def force_platform_from_env() -> None:
    """Honor ``A2F_FORCE_PLATFORM`` before JAX initializes.

    The env var ``JAX_PLATFORMS`` alone is not sufficient on hosts where a
    TPU PJRT plugin (axon) force-registers itself; the platform must be
    pinned through the config API. Entry points call this first so tests and
    subprocesses can hermetically select the CPU backend."""
    plat = os.environ.get("A2F_FORCE_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    force_platform_from_env()

    path = path or os.environ.get("A2F_JAX_CACHE_DIR", _DEFAULT_DIR)
    try:
        if jax.default_backend() != "tpu":
            # CPU AOT entries are huge and machine-feature-specific
            # (loading them on another host risks SIGILL); TPU entries are
            # small and portable across same-generation chips
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # persist EVERY program, including sub-second utility jits
        # (convert_element_type, threefry, broadcast...): the default 1 s
        # floor leaves dozens of tiny programs to recompile in every
        # process, and remote-tunnel compile latency is bimodal — normally
        # ~0.5 s each, but a stalled compile server turns each into
        # 60 s+ (measured: the same warm flagship run is 120 s in a good
        # mood and 800 s in a bad one, all of it in tiny-program
        # backend_compile calls)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail an entry point over it
