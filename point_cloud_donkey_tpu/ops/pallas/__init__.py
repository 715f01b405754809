"""Pallas TPU kernels for the HBM-bound hot ops, plus the shared
auto-enable probe.

A pallas_call on a runtime without Pallas support (e.g. some TPU tunnel
transports) kills the calling process with no traceback, so viability is
probed once per (process, backend) in a SUBPROCESS; results are cached.
PCD_USE_PALLAS=1 forces the kernels on, =0 forces them off, unset = auto
(real TPU backends only -- CPU keeps the XLA paths so test goldens stay
bit-stable).
"""

from __future__ import annotations

_PALLAS_AUTO = {}  # per-process probe cache, keyed by default backend name
# (keyed, not a single bool: one process can switch backends -- e.g. the
# driver runs entry() on the TPU then forces a CPU mesh for the multichip
# dryrun -- and a cached TPU "ok" must not route the CPU backend to pallas)


def _probe_cache_path() -> str:
    """Disk-cache location for a CONCLUSIVE probe verdict, keyed by the jax
    version and device kind (the things whose change could alter pallas
    viability)."""
    import os

    import jax
    kind = str(getattr(jax.devices()[0], "device_kind",
                       jax.default_backend()))
    key = f"{jax.__version__}-{kind}".replace(" ", "_").replace("/", "_")
    d = os.path.join(os.path.expanduser("~"), ".cache",
                     "point_cloud_donkey_tpu")
    return os.path.join(d, f"pallas_probe_{key}")


def probe_pallas(timeout_s: float = 240.0) -> bool:
    """Run the minimal doubling kernel in a subprocess; True iff it works.

    The subprocess pays full backend init (on the axon tunnel: 80-240+s,
    and under load it can exceed any reasonable timeout), so CONCLUSIVE
    verdicts are cached on disk keyed by (jax version, device kind): a
    measured "ok" or a subprocess CRASH is stable machine state, while a
    timeout is inconclusive (contention) and is never cached -- without
    the cache a flaky timeout silently dropped the serving headline ~30%
    by routing the LRF/moments stages to the XLA fallback."""
    import os
    import subprocess
    import sys

    cache = None
    try:
        cache = _probe_cache_path()
        with open(cache) as f:
            verdict = f.read().strip()
        if verdict in ("ok", "crash"):
            return verdict == "ok"
    except FileNotFoundError:
        pass
    except Exception:
        cache = None

    code = (
        "import jax, jax.numpy as jnp\n"
        "from jax.experimental import pallas as pl\n"
        "def k(x_ref, o_ref):\n"
        "    o_ref[...] = x_ref[...] * 2\n"
        "x = jnp.arange(256, dtype=jnp.float32).reshape(2, 128)\n"
        "y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)\n"
        "assert (y == x * 2).all()\n"
        "print('PALLAS_OK')\n")

    def remember(verdict: str) -> None:
        if cache is None:
            return
        try:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            with open(cache, "w") as f:
                f.write(verdict)
        except Exception:
            pass

    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        if b"PALLAS_OK" in r.stdout:
            remember("ok")
            return True
        # ran to completion and failed: a real crash, stable for this
        # (jax, device) pair
        remember("crash")
        return False
    except subprocess.TimeoutExpired:
        return False  # inconclusive -- do not cache
    except Exception:
        return False


def use_pallas() -> bool:
    """Shared kernel-path selector (see module docstring)."""
    import os
    v = os.environ.get("PCD_USE_PALLAS")
    if v == "1":
        return True
    if v == "0":
        return False
    import jax
    backend = jax.default_backend()
    if backend in ("cpu", "gpu"):
        return False
    if backend not in _PALLAS_AUTO:
        _PALLAS_AUTO[backend] = probe_pallas()
    return _PALLAS_AUTO[backend]
