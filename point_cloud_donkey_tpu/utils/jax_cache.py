"""Persistent XLA compilation cache.

Every entry point (bench, CLIs, tests, graft entry) calls
enable_persistent_cache() before building programs: compiled executables are
keyed by HLO hash and stored under ~/.cache/pcd_tpu_xla, so a repeat process
skips the 20-90s per-program compile latency of the TPU tunnel entirely
(measured: 1.6s -> 0.03s for a second-process compile+run).

The reference has no analogous machinery (single C++ process, no JIT); this
is pure TPU-runtime infrastructure.  Controls:
  PCD_XLA_CACHE=0           disable
  PCD_XLA_CACHE_DIR=<path>  override the cache directory
  PCD_XLA_CACHE_READONLY=1  read entries but never write: XLA's
                            LoadedExecutable.serialize() segfaults in
                            long-lived CPU processes (reproduced twice
                            ~19-28 min into the full test suite; crash
                            frame compilation_cache.put_executable_and_
                            time -> executable.serialize()).  The write
                            path is skipped by raising the min-compile-
                            time threshold, which jax checks BEFORE
                            serializing.  tests/conftest.py sets this
                            for large sessions.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "pcd_tpu_xla")
_enabled = False


def enable_persistent_cache() -> bool:
    """Idempotent; returns True when the cache is active."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("PCD_XLA_CACHE", "1") == "0":
        return False
    path = os.environ.get("PCD_XLA_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        read_only = os.environ.get("PCD_XLA_CACHE_READONLY") == "1"
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          99999.0 if read_only else 0.5)
        _enabled = True
    except Exception:
        # an old jax without the knobs or an unwritable home must never
        # break the pipeline -- the cache is a pure accelerant
        return False
    return True
