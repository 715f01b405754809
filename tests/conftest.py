import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs them).
# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var, so the platform
# must be forced through jax.config before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# PCD_TPU_SMOKE=1 runs the -m tpu smoke subset on the real device instead
# of the forced CPU mesh (tests/test_tpu_smoke.py)
if os.environ.get("PCD_TPU_SMOKE") != "1":
    jax.config.update("jax_platforms", "cpu")
    # Persistent XLA compilation cache: most suite wall-time is CPU compiles
    # of the same programs across test processes/runs; cache them on disk.
    # (NOT enabled for the axon TPU backend -- measured 6x slower there.)
    # The dir is keyed by the host's CPU feature set: XLA loads AOT results
    # compiled on a different machine with only a warning, and mismatched
    # vector extensions can SIGILL (cpu_aot_loader.cc warns exactly this
    # when a cache moves between hosts).
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            sig_src = next(ln for ln in f if ln.startswith("flags"))
    except Exception:
        import platform
        sig_src = platform.machine() + platform.processor()
    sig = hashlib.sha1(sig_src.encode()).hexdigest()[:10]
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_TEST_CACHE_DIR",
                                     f"/tmp/jax_test_cache_{sig}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


def pytest_collection_modifyitems(session, config, items):
    # Large sessions run the compilation cache READ-ONLY: XLA's
    # LoadedExecutable.serialize() segfaults in long-lived CPU processes
    # (reproduced twice at ~19-28 min into the full suite, crash frame
    # jax/_src/compilation_cache.py put_executable_and_time ->
    # executable.serialize(); short processes write the same entries
    # fine).  Raising the min-compile-time threshold skips the write path
    # entirely (compiler.py checks it BEFORE serializing), so full-suite
    # runs only read; targeted runs (< 100 tests) keep populating the
    # cache.
    if len(items) > 100 and os.environ.get("PCD_TPU_SMOKE") != "1":
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          99999.0)
        # tests that import the CLIs trigger utils/jax_cache.
        # enable_persistent_cache(), which would reset the threshold (and
        # the cache dir) mid-suite -- the env flag makes it honor
        # read-only mode too
        os.environ["PCD_XLA_CACHE_READONLY"] = "1"


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same fresh stream it would see
    # when run alone, so tests cannot couple through shared rng state
    return np.random.default_rng(42)
