"""AOT-compiled executable cache for fixed-shape serving programs.

Why: first compile of the serving program on the axon v5e tunnel takes
minutes with huge variance (59 s / 391 s / 510 s for the same program,
CHANGES_R4 #20), and the JAX persistent *compilation* cache measured ~6x
slower on this backend, so it is deliberately disabled
(utils/jax_cache.py).  This sidesteps both: `jax.jit(f).lower(args)
.compile()` once, serialize the PJRT executable
(jax.experimental.serialize_executable), and on the next process start
deserialize_and_load -- no XLA run at all.

Portability contract: a serialized executable is valid only for the exact
(jax version, device kind, program) triple -- the cache key includes all
three plus the caller's config/shape fingerprint, and any load failure
falls back to a fresh compile (the bytes are machine-local state, like the
pallas probe cache)."""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Tuple


def _key(extra: str) -> str:
    import jax
    kind = str(getattr(jax.devices()[0], "device_kind",
                       jax.default_backend()))
    raw = f"{jax.__version__}|{kind}|{extra}"
    return hashlib.sha1(raw.encode()).hexdigest()[:24]


def load_or_compile(jitted: Callable, example_args: Tuple[Any, ...],
                    cache_dir: str, key_extra: str):
    """Return (compiled_callable, source) where source is "aot-cache" when
    a serialized executable was loaded (no XLA compile) or "compiled" when
    it was built (and cached) now.  `jitted` must be a jax.jit-wrapped
    function; `key_extra` must fingerprint everything that shapes the
    program (config repr, shapes, device count)."""
    from jax.experimental import serialize_executable as se

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"aot_{_key(key_extra)}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            compiled = se.deserialize_and_load(
                payload["serialized"], payload["in_tree"],
                payload["out_tree"])
            return compiled, "aot-cache"
        except Exception as e:  # stale jax/device/program: recompile
            try:
                os.remove(path)
            except OSError:
                pass
            src = f"compiled (stale aot cache: {type(e).__name__})"
        else:  # pragma: no cover
            src = "compiled"
    else:
        src = "compiled"

    compiled = jitted.lower(*example_args).compile()
    try:
        serialized, in_tree, out_tree = se.serialize(compiled)
        with open(path, "wb") as f:
            pickle.dump({"serialized": serialized, "in_tree": in_tree,
                         "out_tree": out_tree}, f)
    except Exception as e:
        src = f"compiled (serialize unsupported: {type(e).__name__})"
    return compiled, src
