"""Process-level JAX runtime setup shared by the CLI entry points.

The persistent compilation cache matters a lot in this stack: the
full-scale train/behavior programs take minutes to build (the TPU compile
service round-trip dominates), and the cache drops warm-start to seconds.
bench.py and the profiling scripts already enabled it ad hoc; the training
CLIs route through here so every entry point gets the same behavior.
"""

import os


def enable_persistent_cache(min_compile_secs: float = 1.0) -> str:
    """Point JAX's compilation cache at ``<repo>/.jax_cache`` (gitignored).

    Must run before the first compilation; safe to call more than once.
    Returns the cache directory.
    """
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
