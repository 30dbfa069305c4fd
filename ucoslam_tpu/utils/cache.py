"""Persistent XLA compilation cache (shared by apps, bench, tools).

First compiles of the production-sized programs cost tens of seconds on
the TPU platform (and each shape bucket recompiles); the on-disk cache
makes every later run — and every later bucket revisit across processes —
start hot. Apps call enable_compile_cache() before building a System.
"""

from __future__ import annotations

import os
import sys

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax

    try:
        d = cache_dir or os.environ.get("UCOSLAM_JAX_CACHE", _DEFAULT_DIR)
        # one cache per backend: CPU-AOT entries compiled under the TPU
        # host's machine profile SIGILL-risk on this host (and vice versa)
        d = os.path.join(d, jax.default_backend())
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # persist EVERYTHING: on the tunnel backend even "fast" compiles
        # cost ~0.45s each, and a run dispatches hundreds of small programs
        # (a 0.5s threshold silently recompiled 223 of 300 programs per run)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimization; never fail over it
        print(f"compile cache disabled: {e}", file=sys.stderr)
