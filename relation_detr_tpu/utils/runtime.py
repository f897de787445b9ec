"""Process-level runtime setup shared by every CLI entry point.

The reference gets kernel caching for free from torch/cuDNN; under XLA each
process re-pays every jit compile unless the persistent compilation cache is
enabled (on this container's axon platform a big graph costs 1-7 min of
remote-relay compile, so a warm cache removes ~1/3 of a val2017-scale eval
wall — PERF.md "warm vs cold"). Called by train.py / test.py / inference.py /
bench.py / tools before the first jit.
"""
from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/relation_detr_tpu/xla_cache")


def enable_compilation_cache(cache_dir: str = None) -> str:
    """Point jax at a persistent on-disk compilation cache.

    Priority: explicit arg > JAX_COMPILATION_CACHE_DIR env (jax also reads it
    natively; we respect it rather than clobbering) > the default user-cache
    path. Returns the directory in use. Set the env var to "" to disable.
    """
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        if env is not None:
            if env == "":  # explicit opt-out
                return ""
            cache_dir = env
        else:
            cache_dir = DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took noticeable compile time; the default 1 s
    # floor would skip the many small-but-relayed graphs on axon
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
