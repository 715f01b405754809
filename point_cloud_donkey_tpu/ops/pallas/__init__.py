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


def probe_pallas(timeout_s: float = 240.0) -> bool:
    """Run the minimal doubling kernel in a subprocess; True iff it works."""
    import subprocess
    import sys
    code = (
        "import jax, jax.numpy as jnp\n"
        "from jax.experimental import pallas as pl\n"
        "def k(x_ref, o_ref):\n"
        "    o_ref[...] = x_ref[...] * 2\n"
        "x = jnp.arange(256, dtype=jnp.float32).reshape(2, 128)\n"
        "y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)\n"
        "assert (y == x * 2).all()\n"
        "print('PALLAS_OK')\n")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return b"PALLAS_OK" in r.stdout
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
