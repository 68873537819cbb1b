"""Persistent XLA compilation cache setup shared by every CLI entry point.

The fused train step takes minutes to compile through a remote-compile
backend (BENCH_NOTES.md); a persistent on-disk cache makes every run after
the first start in seconds. No reference analog (torch eager has no
compile step).
"""

from __future__ import annotations

import os

import jax

# Repo-local so the primed cache survives machine restarts (/tmp is wiped on
# reboot — observed 2026-08-20: a restart discarded the primed train-step pair
# and the next bench would have paid the full remote cold compile again).
DEFAULT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))


def enable(cache_dir: str | None = None) -> str:
    """Point jax at a persistent compilation cache; env
    ACLGAN_COMPILE_CACHE / JAX_COMPILATION_CACHE_DIR override the default."""
    cache_dir = (cache_dir or os.environ.get("ACLGAN_COMPILE_CACHE")
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
