"""Persistent XLA compilation cache setup.

First compiles of the fused extraction/scoring graphs cost 1-3 minutes
through this environment's remote-compile path; the persistent cache brings
repeat-process startup down to seconds.  Call `enable()` early (the CLI,
bench, and pipelines do).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "CIA_TPU_XLA_CACHE", os.path.expanduser("~/.cache/cia_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: harmless no-op
